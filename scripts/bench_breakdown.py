"""Per-stage time breakdown of the bench.py forward workload.

Reproduces the BASELINE.md "single-chip time breakdown" table from the
repo (it was previously produced by uncommitted /tmp scripts):

    python scripts/bench_breakdown.py [B] [iters] [dtype]
    python scripts/bench_breakdown.py 4 20 bfloat16 --trace /tmp/nm_trace

Stages timed independently with block_until_ready (each its own jitted
program, so per-stage numbers slightly over-count vs the fused full
forward — the "full forward" row is the honest end-to-end figure):

  * encoder    — VoxToKyptNet (conv pyramid + st-prior net + soft-argmax
                 + gaussian render) on (B, T) folded frames
  * decoder    — KyptToVoxNet from precomputed gaussians/first_feature
  * det-losses — full detector forward minus encoder+decoder (derived)
  * vrnn       — HSVRNNBVH.encode on precomputed keypoints
  * full       — the bench.py encode_only program (detector + losses +
                 VRNN, loss scalars live)

With --trace, additionally captures a jax.profiler trace of 3 full-forward
steps into the given directory; analyze with scripts/analyze_trace.py.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _time(fn, *args, iters=20):
    import jax
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_marionette_tpu.config import MarionetteConfig, adjust_config
    from neural_marionette_tpu.models import (NeuralMarionette,
                                              SkeletonArrays)
    from neural_marionette_tpu.ops import voxelize_jnp

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if len(args) > 0 else 4
    iters = int(args[1]) if len(args) > 1 else 20
    dtype_name = args[2] if len(args) > 2 else "bfloat16"
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    # --only-full: skip the per-stage programs (at B>=16 their kept-alive
    # intermediates + extra executables exhaust HBM) and just time/trace
    # the honest end-to-end forward.
    only_full = "--only-full" in sys.argv

    cfg = adjust_config(MarionetteConfig(dataset="aist"))
    T, G = cfg.Ttot, cfg.grid_size
    model = NeuralMarionette(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(B, T, 2048, 3)),
                      dtype=jnp.float32)
    batch = voxelize_jnp(pts, G)
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    # init eagerly executes the forward op-by-op — tiny slice (bench.py's
    # lesson: eager init at B>=8 is an HBM OOM; param shapes are
    # batch-independent)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        batch[:1, :2], detector_active=True,
                        learner_active=True, skeleton=sk)
    sample_rng = {"sample": jax.random.PRNGKey(2)}

    @jax.jit
    def full(params, batch):
        out = model.apply(params, batch, sk,
                          method=NeuralMarionette.encode_only,
                          rngs=sample_rng)
        losses = jnp.stack([out[k] for k in
                            ("recon_loss", "sparsity_loss",
                             "separation_loss", "vol_fit_reg",
                             "kypt_recon_loss", "kl_kypt")])
        return out["keypoints"], losses, jnp.sum(out["recon"])

    if only_full:
        dt = _time(full, params, batch, iters=iters)
        dev = jax.devices()[0]
        print(f"# B={B} T={T} G={G} dtype={dtype_name} "
              f"device={dev.platform} iters={iters} (full only)")
        print(f"{'FULL forward (bench.py)':34s} {dt * 1e3:9.2f}")
        print(f"{'seqs/sec (full)':34s} {B / dt:9.2f}")
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
            for _ in range(3):
                out = full(params, batch)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            print(f"trace written to {trace_dir}")
        return

    @jax.jit
    def encoder(params, batch):
        hm, kp, ga, ff = model.apply(
            params, batch,
            method=lambda m, v: m.kypt_detector.vox_to_kypt(v))
        return kp, jnp.sum(hm), jnp.sum(ga), jnp.sum(ff)

    @jax.jit
    def detector(params, batch):
        out = model.apply(params, batch, detector_active=True,
                          learner_active=False)
        return out["keypoints"], out["recon_loss"], out["vol_fit_reg"]

    # precompute inputs for decoder / vrnn stage programs
    _, _, gaussians, first_feature = model.apply(
        params, batch, method=lambda m, v: m.kypt_detector.vox_to_kypt(v))
    det_out = model.apply(params, batch, detector_active=True,
                          learner_active=False)
    keypoints = det_out["keypoints"]
    first_frame = batch[:, 0]

    @jax.jit
    def decoder(params, gaussians, first_feature, first_frame):
        return jnp.sum(model.apply(
            params, gaussians, first_feature, first_frame,
            method=lambda m, *a: m.kypt_detector.kypt_to_vox(*a)))

    @jax.jit
    def vrnn(params, keypoints):
        out = model.apply(params, keypoints, sk,
                          method=lambda m, *a: m.dyna_module.encode(*a),
                          rngs=sample_rng)
        return out["kypt_recon"], out["kl_kypt"], out["kypt_recon_loss"]

    rows = [
        ("encoder (vox_to_kypt)", _time(encoder, params, batch,
                                        iters=iters)),
        ("decoder (kypt_to_vox)", _time(decoder, params, gaussians,
                                        first_feature, first_frame,
                                        iters=iters)),
        ("detector fwd (enc+dec+losses)", _time(detector, params, batch,
                                                iters=iters)),
        ("vrnn encode", _time(vrnn, params, keypoints, iters=iters)),
        ("FULL forward (bench.py)", _time(full, params, batch,
                                          iters=iters)),
    ]
    by = dict(rows)
    rows.insert(3, ("det losses (derived)",
                    by["detector fwd (enc+dec+losses)"]
                    - by["encoder (vox_to_kypt)"]
                    - by["decoder (kypt_to_vox)"]))

    dev = jax.devices()[0]
    print(f"# B={B} T={T} G={G} dtype={dtype_name} device={dev.platform} "
          f"iters={iters}")
    print(f"{'stage':34s} {'ms':>9s}")
    for name, dt in rows:
        print(f"{name:34s} {dt * 1e3:9.2f}")
    print(f"{'seqs/sec (full)':34s} "
          f"{B / by['FULL forward (bench.py)']:9.2f}")

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            out = full(params, batch)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
