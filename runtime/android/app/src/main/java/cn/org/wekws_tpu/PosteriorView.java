// Scrolling keyword-posterior meter: a ring buffer of recent peak
// posteriors drawn as vertical bars with the trigger threshold line.
// (The reference app draws microphone dB bars — VoiceRectView; this
// view plots what the model actually sees, which is the more useful
// debugging display for a wake word.)
package cn.org.wekws_tpu;

import android.content.Context;
import android.graphics.Canvas;
import android.graphics.Color;
import android.graphics.Paint;
import android.util.AttributeSet;
import android.view.View;

public class PosteriorView extends View {

    private static final int HISTORY = 120;
    private static final float THRESHOLD = 0.5f;

    private final float[] history = new float[HISTORY];
    private int head = 0;
    private final Paint barPaint = new Paint();
    private final Paint hotPaint = new Paint();
    private final Paint linePaint = new Paint();

    public PosteriorView(Context context) {
        this(context, null);
    }

    public PosteriorView(Context context, AttributeSet attrs) {
        super(context, attrs);
        barPaint.setColor(Color.rgb(66, 133, 244));
        hotPaint.setColor(Color.rgb(219, 68, 55));
        linePaint.setColor(Color.GRAY);
        linePaint.setStrokeWidth(2f);
    }

    /** Append one posterior sample [0,1] and redraw. */
    public void push(float value) {
        synchronized (history) {
            history[head] = Math.max(0f, Math.min(1f, value));
            head = (head + 1) % HISTORY;
        }
        postInvalidate();
    }

    public void clear() {
        synchronized (history) {
            java.util.Arrays.fill(history, 0f);
        }
        postInvalidate();
    }

    @Override
    protected void onDraw(Canvas canvas) {
        super.onDraw(canvas);
        int w = getWidth();
        int h = getHeight();
        float barW = (float) w / HISTORY;
        synchronized (history) {
            for (int i = 0; i < HISTORY; i++) {
                float v = history[(head + i) % HISTORY];
                float x = i * barW;
                float top = h * (1f - v);
                canvas.drawRect(x, top, x + barW * 0.8f, h,
                        v > THRESHOLD ? hotPaint : barPaint);
            }
        }
        float ty = h * (1f - THRESHOLD);
        canvas.drawLine(0, ty, w, ty, linePaint);
    }
}
