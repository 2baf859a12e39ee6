"""Streaming-serving benchmark: double-buffered window pipeline.

A serving deployment consumes an endless stream of point-cloud windows:
host -> HBM transfer, detector encode, VRNN rollout per window.  This
measures per-window latency two ways:

* sequential: put window t, run, fetch, then start window t+1;
* pipelined:  window t+1's host->HBM transfer is issued while window t's
  compute is still in flight (JAX async dispatch = the double-buffered
  host->HBM streaming of BASELINE.json's north star).

Done-criterion (VERDICT r2 #7): pipelined per-window wall time <
transfer + compute of the sequential loop (the transfer rides under the
compute).

Usage: python scripts/bench_stream.py [B] [windows] [dtype]
                                      [--rng const|fold|rbg] [--api]
One TPU process at a time.

--rng selects the per-window sample-key strategy (r4→r5 regression
diagnosis: the per-window fold-in cost 52.5 → 58.6 ms/window):
  const: one baked PRNGKey for every window (r3 semantics — XLA constant-
         folds the threefry sample noise, but windows draw IDENTICAL noise)
  fold:  traced threefry key fold_in per window (r4 semantics)
  rbg:   traced RBG key fold_in per window (same independence, hardware
         RNG bit generation instead of threefry vector code)
--api drives the product MarionetteStream.run() path instead of the
bench's own loop (includes its bucketing + fetch bookkeeping).
--xfer f16 ships the raw points over the host->HBM link as float16
(half the bytes; points only feed the voxelizer's grid-64 quantization,
where f16's 1e-3 relative error is ~6% of one voxel cell — serving-
grade, off by default, never for parity paths).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if len(args) > 0 else 4
    n_windows = int(args[1]) if len(args) > 1 else 16
    dtype = jnp.float32 if (len(args) > 2 and args[2] == "float32") \
        else jnp.bfloat16
    rng_mode = sys.argv[sys.argv.index("--rng") + 1] \
        if "--rng" in sys.argv else "fold"
    use_api = "--api" in sys.argv
    xfer = np.float16 if ("--xfer" in sys.argv and
                          sys.argv[sys.argv.index("--xfer") + 1] == "f16") \
        else np.float32

    from neural_marionette_tpu.config import MarionetteConfig, adjust_config
    from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
    from neural_marionette_tpu.ops import voxelize_jnp

    cfg = adjust_config(MarionetteConfig(dataset="aist"))
    T, G = cfg.Ttot, cfg.grid_size
    model = NeuralMarionette(cfg, dtype=dtype)
    sk = SkeletonArrays.chain(cfg.nkeypoints)

    rng = np.random.default_rng(0)
    # host-side windows: raw points (what a stream delivers)
    windows = [rng.uniform(-0.8, 0.8, size=(B, T, 2048, 3))
               .astype(xfer) for _ in range(n_windows)]

    def make_key(idx):
        if rng_mode == "const":
            return jax.random.PRNGKey(2)
        base = jax.random.PRNGKey(2) if rng_mode == "fold" \
            else jax.random.key(2, impl="rbg")
        return jax.random.fold_in(base, idx)

    def encode_window(params, pts, window_idx):
        key = make_key(window_idx)
        vox = voxelize_jnp(pts.astype(jnp.float32), G).astype(dtype)
        out = model.apply(params, vox, sk,
                          method=NeuralMarionette.encode_only,
                          rngs={"sample": key})
        return out["keypoints"], out["kypt_recon"]

    pts0 = jnp.asarray(windows[0])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        voxelize_jnp(pts0[:1, :2].astype(jnp.float32),
                                     G).astype(dtype),
                        detector_active=True, learner_active=True,
                        skeleton=sk)
    compiled = jax.jit(encode_window).lower(
        params, pts0, jnp.uint32(0)).compile()

    def fetch(out):
        return np.asarray(out[0])  # keypoints back to the host consumer

    # warmup
    fetch(compiled(params, jax.device_put(pts0), jnp.uint32(0)))

    if use_api:
        _bench_api(model, params, sk, windows, dtype, B, n_windows)
        return

    # --- sequential: put -> run -> fetch, one window at a time
    t0 = time.perf_counter()
    for i, w in enumerate(windows):
        dev = jax.device_put(w)
        jax.block_until_ready(dev)
        out = compiled(params, dev, jnp.uint32(i))
        fetch(out)
    seq = (time.perf_counter() - t0) / n_windows

    # --- pipelined: next window's transfer issued under current compute;
    # per-window completion times recorded for the latency distribution
    lat = []
    t0 = time.perf_counter()
    dev = jax.device_put(windows[0])
    pending = None
    for i, w in enumerate(windows):
        out = compiled(params, dev, jnp.uint32(i))   # async dispatch
        if i + 1 < n_windows:
            dev = jax.device_put(windows[i + 1])  # transfer under compute
        if pending is not None:
            fetch(pending)                    # consume window i-1
            lat.append(time.perf_counter())
        pending = out
    fetch(pending)
    lat.append(time.perf_counter())
    pipe = (lat[-1] - t0) / n_windows
    # inter-completion gaps = per-window serving latency in steady state
    gaps = np.diff(np.asarray([t0] + lat)) * 1e3
    p50, p99 = np.percentile(gaps[1:], 50), np.percentile(gaps[1:], 99)

    # transfer-only cost for the report
    t0 = time.perf_counter()
    for w in windows:
        jax.block_until_ready(jax.device_put(w))
    put = (time.perf_counter() - t0) / n_windows

    print(f"windows={n_windows} B={B} dtype={jnp.dtype(dtype).name} "
          f"rng={rng_mode} xfer={np.dtype(xfer).name}")
    print(f"host->HBM transfer     : {put*1e3:7.2f} ms/window")
    print(f"sequential put+run+fetch: {seq*1e3:7.2f} ms/window")
    print(f"pipelined (double-buf) : {pipe*1e3:7.2f} ms/window")
    print(f"pipelined latency      : p50 {p50:7.2f} ms  p99 {p99:7.2f} ms"
          f"  (steady-state inter-completion gaps)")
    print(f"overlap win: {seq/pipe:.2f}x  "
          f"(hidden {max(seq-pipe, 0)*1e3:.1f} ms/window)")


def _bench_api(model, params, sk, windows, dtype, B, n_windows):
    """Time the PRODUCT streaming path (MarionetteStream.run) end to end."""
    import time

    from neural_marionette_tpu.api import MarionetteStream
    from neural_marionette_tpu.apps.common import DemoContext
    from neural_marionette_tpu.skeleton import Skeleton

    ctx = DemoContext(cfg=model.cfg, model=model, params=params,
                      skeleton=None)
    K = model.cfg.nkeypoints
    parents = np.concatenate([[-1], np.arange(K - 1)]).astype(np.int32)
    A = np.zeros((K, K), np.float32)
    A[np.arange(1, K), np.arange(K - 1)] = 1
    skeleton = Skeleton(A=np.maximum(A, A.T),
                        priority_values=np.zeros((K,), np.float32),
                        priority_indices=np.arange(K, dtype=np.int32),
                        parents=parents)
    stream = MarionetteStream(ctx, skeleton,
                              dtype=jnp.dtype(dtype).name, sample_num=10)
    # warmup (compile)
    stream.submit(windows[0])
    res = stream.flush()
    assert res is not None
    stream = MarionetteStream(ctx, skeleton,
                              dtype=jnp.dtype(dtype).name, sample_num=10)
    lat = []
    t0 = time.perf_counter()
    for _ in stream.run(iter(windows)):
        lat.append(time.perf_counter())
    total = (lat[-1] - t0) / n_windows
    gaps = np.diff(np.asarray([t0] + lat)) * 1e3
    p50, p99 = np.percentile(gaps[1:], 50), np.percentile(gaps[1:], 99)
    print(f"MarionetteStream.run (product path): {total*1e3:7.2f} ms/window"
          f"  p50 {p50:7.2f} ms  p99 {p99:7.2f} ms")


if __name__ == "__main__":
    main()
