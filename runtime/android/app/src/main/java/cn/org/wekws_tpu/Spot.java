package cn.org.wekws_tpu;

/** Native keyword-spotting engine binding (see spot_jni.cc). */
public class Spot {
    static {
        System.loadLibrary("wekws_jni");
    }

    public static native void init(String modelDir, boolean softmax);

    public static native void reset();

    public static native void acceptWaveform(short[] waveform);

    public static native void setInputFinished();

    /** Returns flattened (frames x outputDim) posteriors. */
    public static native float[] decode(int batchSize);
}
