// On-device wake-word demo over the native graph-artifact runtime.
//
// Same product surface as the reference app
// (/root/reference/runtime/android .. MainActivity.java: permission
// flow, asset unpack, AudioRecord capture thread feeding the JNI
// spotter, a decode thread polling posteriors into the UI) — built on
// this runtime's dependency-free artifact (model.txt + weights.bin
// assets) instead of an .ort bundle, and with a posterior-history
// meter instead of dB bars.
package cn.org.wekws_tpu;

import android.Manifest;
import android.content.Context;
import android.content.pm.PackageManager;
import android.content.res.AssetManager;
import android.media.AudioFormat;
import android.media.AudioRecord;
import android.media.MediaRecorder;
import android.os.Bundle;
import android.os.Process;
import android.util.Log;
import android.widget.Button;
import android.widget.TextView;
import android.widget.Toast;

import androidx.appcompat.app.AppCompatActivity;
import androidx.core.app.ActivityCompat;
import androidx.core.content.ContextCompat;

import java.io.File;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import java.util.Arrays;
import java.util.List;
import java.util.concurrent.ArrayBlockingQueue;
import java.util.concurrent.BlockingQueue;

public class MainActivity extends AppCompatActivity {

    private static final String TAG = "WEKWS_TPU";
    private static final int PERMISSION_RECORD_AUDIO = 1;
    private static final int SAMPLE_RATE = 16000;
    private static final int DECODE_BATCH = 16;
    private static final float TRIGGER_THRESHOLD = 0.5f;
    // ~100 s of audio at 40 ms chunks
    private static final int MAX_QUEUE_CHUNKS = 2500;
    // the exported graph artifact, shipped in assets/
    private static final List<String> MODEL_FILES =
            Arrays.asList("model.txt", "weights.bin", "weights_int8.bin");

    private volatile boolean recording = false;
    private AudioRecord record = null;
    private int chunkSamples = 0;
    private final BlockingQueue<short[]> pcmQueue =
            new ArrayBlockingQueue<>(MAX_QUEUE_CHUNKS);

    /** Copy the model artifact from assets into filesDir (once). */
    private static void unpackAssets(Context context) throws IOException {
        AssetManager assets = context.getAssets();
        List<String> present = Arrays.asList(assets.list(""));
        for (String name : MODEL_FILES) {
            if (!present.contains(name)) continue;  // int8 blob optional
            File dst = new File(context.getFilesDir(), name);
            if (dst.exists() && dst.length() > 0) continue;
            Log.i(TAG, "unpacking " + name);
            try (InputStream is = assets.open(name);
                 OutputStream os = new FileOutputStream(dst)) {
                byte[] buf = new byte[1 << 16];
                int n;
                while ((n = is.read(buf)) != -1) os.write(buf, 0, n);
            }
        }
    }

    @Override
    protected void onCreate(Bundle savedInstanceState) {
        super.onCreate(savedInstanceState);
        setContentView(R.layout.activity_main);
        try {
            unpackAssets(this);
        } catch (IOException e) {
            Log.e(TAG, "asset unpack failed", e);
        }
        Spot.init(getFilesDir().getPath(), false);

        TextView hint = findViewById(R.id.hintText);
        hint.setText(R.string.hint);

        if (ContextCompat.checkSelfPermission(this,
                Manifest.permission.RECORD_AUDIO)
                != PackageManager.PERMISSION_GRANTED) {
            ActivityCompat.requestPermissions(this,
                    new String[]{Manifest.permission.RECORD_AUDIO},
                    PERMISSION_RECORD_AUDIO);
        } else {
            initRecorder();
        }

        Button button = findViewById(R.id.toggleButton);
        button.setText(R.string.start);
        button.setOnClickListener(v -> {
            if (!recording) {
                if (record == null) {
                    Toast.makeText(this, R.string.no_recorder,
                            Toast.LENGTH_SHORT).show();
                    return;
                }
                recording = true;
                Spot.reset();
                startCaptureThread();
                startFeedThread();
                startSpotThread();
                button.setText(R.string.stop);
            } else {
                recording = false;
                Spot.setInputFinished();
                button.setText(R.string.start);
            }
        });
    }

    @Override
    public void onRequestPermissionsResult(
            int code, String[] permissions, int[] grants) {
        super.onRequestPermissionsResult(code, permissions, grants);
        if (code == PERMISSION_RECORD_AUDIO) {
            if (grants.length > 0
                    && grants[0] == PackageManager.PERMISSION_GRANTED) {
                initRecorder();
            } else {
                Toast.makeText(this, R.string.no_permission,
                        Toast.LENGTH_LONG).show();
                findViewById(R.id.toggleButton).setEnabled(false);
            }
        }
    }

    private void initRecorder() {
        int minBytes = AudioRecord.getMinBufferSize(SAMPLE_RATE,
                AudioFormat.CHANNEL_IN_MONO,
                AudioFormat.ENCODING_PCM_16BIT);
        if (minBytes == AudioRecord.ERROR
                || minBytes == AudioRecord.ERROR_BAD_VALUE) {
            Log.e(TAG, "cannot size audio buffer");
            return;
        }
        chunkSamples = Math.max(minBytes / 2, SAMPLE_RATE / 25);  // >=40ms
        if (ActivityCompat.checkSelfPermission(this,
                Manifest.permission.RECORD_AUDIO)
                != PackageManager.PERMISSION_GRANTED) {
            return;
        }
        record = new AudioRecord(MediaRecorder.AudioSource.DEFAULT,
                SAMPLE_RATE, AudioFormat.CHANNEL_IN_MONO,
                AudioFormat.ENCODING_PCM_16BIT, chunkSamples * 2);
        if (record.getState() != AudioRecord.STATE_INITIALIZED) {
            Log.e(TAG, "AudioRecord init failed");
            record = null;
        }
    }

    /** Mic -> pcmQueue. */
    private void startCaptureThread() {
        new Thread(() -> {
            Process.setThreadPriority(Process.THREAD_PRIORITY_AUDIO);
            record.startRecording();
            while (recording) {
                short[] chunk = new short[chunkSamples];
                int n = record.read(chunk, 0, chunk.length);
                if (n > 0 && n != AudioRecord.ERROR_INVALID_OPERATION) {
                    pcmQueue.offer(n == chunk.length
                            ? chunk : Arrays.copyOf(chunk, n));
                }
            }
            record.stop();
        }).start();
    }

    /** pcmQueue -> native engine. */
    private void startFeedThread() {
        new Thread(() -> {
            while (recording || !pcmQueue.isEmpty()) {
                try {
                    short[] chunk = pcmQueue.take();
                    Spot.acceptWaveform(chunk);
                } catch (InterruptedException e) {
                    break;
                }
            }
        }).start();
    }

    /** Poll posteriors -> meter + detection banner. */
    private void startSpotThread() {
        new Thread(() -> {
            PosteriorView meter = findViewById(R.id.posteriorView);
            TextView banner = findViewById(R.id.detectionText);
            long lastTriggerMs = 0;
            while (true) {
                float[] flat = Spot.decode(DECODE_BATCH);
                if (flat.length == 0) {
                    if (!recording) break;
                    continue;
                }
                // flattened (frames x dim): track the max keyword
                // posterior per poll
                float peak = 0f;
                for (float p : flat) peak = Math.max(peak, p);
                final float level = peak;
                meter.push(level);
                long now = System.currentTimeMillis();
                if (level > TRIGGER_THRESHOLD
                        && now - lastTriggerMs > 1000) {
                    lastTriggerMs = now;
                    runOnUiThread(() -> {
                        banner.setText(getString(
                                R.string.detected, level));
                    });
                } else if (now - lastTriggerMs > 2000) {
                    runOnUiThread(() -> banner.setText(""));
                }
            }
        }).start();
    }
}
