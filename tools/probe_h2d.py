"""H2D staging-rate probe (r4 verdict #3: overlap epoch staging).

Measures what actually governs device-resident staging cost on this
rig, BEFORE building an overlap mechanism around the wrong model:

  1. bulk device_put rate on an idle device (the current staging path)
  2. chunked device_put rate (one chunk per call, sequentially)
  3. chunked rate with 2/4 Python threads (does the tunnel pipeline
     concurrent transfers?)
  4. the r3 'H2D anomaly': the same transfers AFTER a real model
     program has executed (historically ~1.5 GB/s -> ~45 MB/s)
  5. chunked transfers INTERLEAVED with train-step compute — the rate
     an overlap design would actually get

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_h2d.py
"""

import concurrent.futures as cf
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GB = 1 << 30


def rate(nbytes, secs):
    return f"{nbytes / GB / secs:6.2f} GB/s ({secs * 1e3:8.1f} ms)"


_SUM_FNS = {}


def _sum_fn(shape, dtype):
    """Pre-compiled tiny consumer per shape: the transfer-completion
    barrier.  (Fetching a fresh slice like ``np.asarray(o[0, :1])``
    COMPILES a new slice executable through the tunnel — seconds per
    shape — which swamped the first version of this probe.)"""
    import jax

    key = (shape, str(dtype))
    if key not in _SUM_FNS:
        fn = jax.jit(lambda x: x.sum())
        fn(jax.numpy.zeros(shape, dtype)).block_until_ready()
        _SUM_FNS[key] = fn
    return _SUM_FNS[key]


def put_all(arrays):
    import jax

    for a in arrays:  # warm the consumer compiles OUTSIDE the timing
        _sum_fn(a.shape, a.dtype)
    t0 = time.perf_counter()
    out = [jax.device_put(a) for a in arrays]
    acc = 0
    for o in out:
        acc = acc + _sum_fn(o.shape, o.dtype)(o)
    np.asarray(acc)
    return time.perf_counter() - t0, out


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    total_mb = int(os.environ.get("PROBE_H2D_MB", 512))
    rows = total_mb * 16  # 64 KB rows
    big = rng.integers(-1000, 1000, (rows, 32768), np.int16)
    nbytes = big.nbytes

    # 1. bulk, idle device
    dt, out = put_all([big])
    print(f"bulk idle           : {rate(nbytes, dt)}", flush=True)
    del out

    # 2. chunked sequential (32 MB chunks)
    chunk_rows = 512
    chunks = [big[i:i + chunk_rows] for i in range(0, rows, chunk_rows)]
    dt, out = put_all(chunks)
    print(f"chunked idle (32MB) : {rate(nbytes, dt)}", flush=True)
    del out

    # 3. chunked with threads
    for workers in (2, 4):
        _sum_fn(chunks[0].shape, chunks[0].dtype)
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(workers) as ex:
            outs = list(ex.map(lambda c: jax.device_put(c), chunks))
        acc = 0
        for o in outs:
            acc = acc + _sum_fn(o.shape, o.dtype)(o)
        np.asarray(acc)
        dt = time.perf_counter() - t0
        print(f"chunked {workers} threads   : {rate(nbytes, dt)}",
              flush=True)
        del outs

    # 4. after a model program: run the flagship step once, re-measure
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)
    y = jfn(*args)
    np.asarray(y).reshape(-1)[:1]
    dt, out = put_all([big])
    print(f"bulk after program  : {rate(nbytes, dt)}", flush=True)
    del out

    # 5. interleaved with compute: enqueue a step between chunk puts
    t0 = time.perf_counter()
    outs = []
    for i, c in enumerate(chunks):
        outs.append(jax.device_put(c))
        if i % 4 == 0:
            y = jfn(*args)
    acc = 0
    for o in outs:
        acc = acc + _sum_fn(o.shape, o.dtype)(o)
    np.asarray(acc)
    np.asarray(y).reshape(-1)[:1]
    dt = time.perf_counter() - t0
    print(f"interleaved w/ steps: {rate(nbytes, dt)}", flush=True)


if __name__ == "__main__":
    main()
