"""Training-step throughput benchmark (full fwd+bwd+Adam, all losses).

Complements bench.py (inference north star) with the end-to-end training
number recorded in BASELINE.md.

Usage: python scripts/bench_train.py [B] [iters] [dtype] [grad_accum]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    from neural_marionette_tpu.config import MarionetteConfig, adjust_config
    from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
    from neural_marionette_tpu.ops import voxelize_jnp
    from neural_marionette_tpu.train import (create_train_state,
                                             make_train_step, loss_weights)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype_name = sys.argv[3] if len(sys.argv) > 3 else "float32"
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    accum = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # remat=0 default: microbatches <= 120 folded frames fit without
    # recompute and run ~14% faster (18.32 vs 16.02 seqs/sec at B=24
    # accum=2, BASELINE.md r4); pass 1 for larger microbatches
    remat = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    # strip_max_frames=64: same default the training driver applies
    # (train.py) — with frame-chunked conv stacks the plain path wins
    # from ~64 folded frames up (plain 16.02 vs strip 13.50 seqs/sec at
    # B=24 accum=2, BASELINE.md).  NM_BENCH_STRIP_MAX overrides.
    try:
        strip_max = int(os.environ.get("NM_BENCH_STRIP_MAX", "64"))
    except ValueError:
        raise SystemExit("NM_BENCH_STRIP_MAX must be an int, got "
                         f"{os.environ['NM_BENCH_STRIP_MAX']!r}")
    cfg = adjust_config(MarionetteConfig(dataset="aist",
                                         strip_max_frames=strip_max)).replace(
        remat=remat, grad_accum=accum, compute_dtype=dtype_name,
        # A/B knobs (-1 = backend default): the fused-upconv decoder tail
        # won the r3 FORWARD but its boundary-fix pad/select chains show
        # up in the r4 remat-0 BACKWARD trace — NM_BENCH_UPCONV=0 times
        # the plain decoder for training
        upconv_decoder=int(os.environ.get("NM_BENCH_UPCONV", "-1")),
        strip_decoder=int(os.environ.get("NM_BENCH_STRIP_DEC", "-1")))
    model = NeuralMarionette(cfg, dtype=dtype)
    g = np.random.default_rng(0)
    pts = jnp.asarray(g.uniform(-0.8, 0.8, size=(B, cfg.Ttot, 2048, 3)),
                      dtype=jnp.float32)
    # feed POINT batches like the real driver (the loader ships (B,T,N,3)
    # and the step voxelizes on device via the Pallas kernel) — an f32
    # VOXEL argument is 167 MB at B=16 and pushed accum=1 139 MB over HBM
    batch = pts
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    # init eagerly executes the forward op-by-op (no XLA liveness
    # optimization) — use a tiny slice; param shapes are batch-independent
    init_vox = voxelize_jnp(pts[:1, :2], cfg.grid_size).astype(dtype)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        init_vox, detector_active=True,
                        learner_active=True, skeleton=sk)
    state = create_train_state(cfg, params, jax.random.PRNGKey(2))
    step = make_train_step(model, cfg, loss_weights(cfg), True, True, True,
                           mesh=None, donate=True)

    state, metrics = step(state, batch, sk)
    print("warmup loss:", float(metrics["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, sk)
        # host fetch each iter: under the tunneled axon runtime,
        # block_until_ready alone has produced bogus timings
        float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    # MFU from MODEL FLOPs (utils/flops.py), not the compiled module's
    # cost analysis — the strip path's Toeplitz expansion does up to 2x
    # padding FLOPs by design and would inflate a compiled-FLOPs MFU
    # (VERDICT r3 weak #3).  Remat recompute is likewise not counted.
    from neural_marionette_tpu.utils.flops import train_step_flops, mfu
    step_flops = train_step_flops(cfg, B)
    peak = float(os.environ.get("NM_PEAK_TFLOPS", "197"))
    print(f"train step B={B} {dtype_name} accum={accum} "
          f"(all losses, detector+learner): "
          f"{dt * 1000:.1f} ms/step -> {B / dt:.2f} seqs/sec, "
          f"model MFU {mfu(step_flops, dt, peak):.3f} "
          f"({step_flops / 1e12:.2f} TF/step @ {peak:.0f} TF/s peak)")

    if "--trace" in sys.argv:
        # per-op backward/trainstep breakdown (analyze with
        # scripts/analyze_trace.py <dir>)
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, metrics = step(state, batch, sk)
        float(metrics["total_loss"])
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
