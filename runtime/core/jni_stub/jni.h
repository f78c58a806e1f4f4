// Host-compile stub of the JNI surface used by the Android bridge
// (android/app/src/main/cpp/spot_jni.cc).  NOT a functional JNI — it
// exists so the default cmake build type-checks the JNI layer on hosts
// without an NDK, catching signature rot in CI (the real jni.h ships
// with the NDK and shadows this one in the Android build).
#ifndef WEKWS_TPU_JNI_STUB_JNI_H_
#define WEKWS_TPU_JNI_STUB_JNI_H_

#include <cstdint>

#define JNIEXPORT __attribute__((visibility("default")))
#define JNICALL

using jboolean = uint8_t;
using jbyte = int8_t;
using jshort = int16_t;
using jint = int32_t;
using jlong = int64_t;
using jfloat = float;
using jdouble = double;
using jsize = jint;

constexpr jboolean JNI_FALSE = 0;
constexpr jboolean JNI_TRUE = 1;

class _jobject {};
using jobject = _jobject*;
using jclass = _jobject*;
using jstring = _jobject*;
using jarray = _jobject*;
using jbooleanArray = _jobject*;
using jshortArray = _jobject*;
using jintArray = _jobject*;
using jfloatArray = _jobject*;
using jobjectArray = _jobject*;

struct JNIEnv {
  const char* GetStringUTFChars(jstring, jboolean*);
  void ReleaseStringUTFChars(jstring, const char*);
  jstring NewStringUTF(const char*);
  jsize GetArrayLength(jarray);
  void GetShortArrayRegion(jshortArray, jsize, jsize, jshort*);
  void SetShortArrayRegion(jshortArray, jsize, jsize, const jshort*);
  jfloatArray NewFloatArray(jsize);
  void GetFloatArrayRegion(jfloatArray, jsize, jsize, jfloat*);
  void SetFloatArrayRegion(jfloatArray, jsize, jsize, const jfloat*);
};

struct JavaVM {
  jint GetEnv(void**, jint);
};

#define JNI_VERSION_1_6 0x00010006
#define JNI_OK 0
#define JNI_ERR (-1)

#endif  // WEKWS_TPU_JNI_STUB_JNI_H_
