// C API over the streaming KWS engine (ctypes/cffi bindings; also the
// FFI surface for other languages).
#ifndef WEKWS_TPU_CAPI_WEKWS_CAPI_H_
#define WEKWS_TPU_CAPI_WEKWS_CAPI_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void* wekws_handle;

// model_dir contains model.txt + weights.bin.  apply_softmax: 1 for
// CTC posteriors.  Returns NULL on failure.
wekws_handle wekws_create(const char* model_dir, int apply_softmax);
void wekws_free(wekws_handle h);

int wekws_output_dim(wekws_handle h);
int wekws_cache_len(wekws_handle h);

// Push int16-scale float samples.
void wekws_accept_waveform(wekws_handle h, const float* samples, int n);
void wekws_set_input_finished(wekws_handle h);

// Decode up to max_frames feature frames.  out: row-major
// (frames, output_dim); frame_index: absolute frame index per row.
// Returns the number of frames written (0 = input drained).
int wekws_decode(wekws_handle h, int max_frames, float* out,
                 int64_t* frame_index);

void wekws_reset(wekws_handle h);

// Decode a PCM wav file (8/16/24/32-bit; channel 0 of multi-channel)
// into int16-scale float samples.  Pass out=NULL to query the sample
// count; otherwise writes min(count, max_n) samples.  Returns the
// total sample count, or -1 when the file is missing/unsupported
// (unsupported layouts abort in the engine binaries; the C API
// reports them as errors instead).
int wekws_read_wav(const char* path, float* out, int max_n,
                   int* sample_rate);

#ifdef __cplusplus
}
#endif

#endif  // WEKWS_TPU_CAPI_WEKWS_CAPI_H_
