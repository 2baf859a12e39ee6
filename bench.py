"""Benchmark: voxel seqs/sec/chip for 64^3 encode + VRNN rollout.

Runs the flagship model (shipped AIST config: grid 64, K=24, feat 128) on
the default JAX backend (the real TPU chip under the driver) and prints ONE
JSON line with the BASELINE.json metric.

``vs_baseline`` compares against the PyTorch reference measured on CPU by
``scripts/measure_reference.py`` (the reference publishes no numbers and
has no TPU path; see BASELINE.md).  Override with NM_REF_SEQS_PER_SEC.
"""
from __future__ import annotations

import json
import os
import time

# PyTorch reference, CPU, B=2 T=10 G=64 K=24 (scripts/measure_reference.py);
# recorded in BASELINE.md.
REF_SEQS_PER_SEC = 0.0537


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_marionette_tpu.config import MarionetteConfig, adjust_config
    from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
    from neural_marionette_tpu.ops import voxelize_jnp

    # B=25 is the single-chip throughput sweet spot.  The old 128-lane
    # frame-padding cliff (B=16 at 54.9, B=32 OOM in r3) is gone since
    # the r4 frame-chunked conv stacks bound the pad to one sub-128
    # tail; the r4 ladder is near-flat: B=4 45.0, B=8 54.5, B=12 75.2,
    # B=16 72.9, B=24 79.3, B=25 80.4, B=32 73.0 seqs/s (BASELINE.md)
    B = int(os.environ.get("NM_BENCH_B", "25"))
    iters = int(os.environ.get("NM_BENCH_ITERS", "20"))
    dtype_name = os.environ.get("NM_BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    cfg = adjust_config(MarionetteConfig(dataset="aist"))  # G=64 K=24 T=10
    T, G = cfg.Ttot, cfg.grid_size
    model = NeuralMarionette(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(B, T, 2048, 3)),
                      dtype=jnp.float32)
    batch = voxelize_jnp(pts, G).astype(dtype)  # occupancy is exact in bf16
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    # init eagerly executes the forward op-by-op (no XLA liveness
    # optimization) — use a tiny slice; param shapes are batch-independent
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        batch[:1, :2], detector_active=True,
                        learner_active=True, skeleton=sk)

    @jax.jit
    def encode_rollout(params, batch):
        out = model.apply(params, batch, sk,
                          method=NeuralMarionette.encode_only,
                          rngs={"sample": jax.random.PRNGKey(2)})
        # return the loss scalars and a recon checksum alongside the
        # keypoints so the voxel decoder + all losses actually execute
        # (the reference forward computes them; without live uses XLA
        # dead-code-eliminates them and the comparison is dishonest)
        losses = jnp.stack([out[k] for k in
                            ("recon_loss", "sparsity_loss",
                             "separation_loss", "vol_fit_reg",
                             "kypt_recon_loss", "kl_kypt")])
        return out["keypoints"], out["kypt_recon"], losses, \
            jnp.sum(out["recon"])

    # warmup / compile
    compiled = encode_rollout.lower(params, batch).compile()
    jax.block_until_ready(compiled(params, batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(params, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    seqs_per_sec = B / dt

    # MFU from XLA's own cost analysis (flops of the compiled module)
    # against the chip's bf16 peak (v5e: ~197 TF/s; override with
    # NM_PEAK_TFLOPS).  "vs CPU reference" flatters; % of chip is the
    # honest yardstick (VERDICT r2 #8).
    mfu = None
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = float(os.environ.get("NM_PEAK_TFLOPS", "197")) * 1e12
        if flops > 0:
            mfu = round(flops / dt / peak, 4)
    except Exception:
        pass

    # model-FLOPs MFU (utils/flops.py): immune to strip-path Toeplitz
    # padding FLOPs and layout pad — the honest cross-config number
    # (VERDICT r3 weak #3); "mfu" (compiled FLOPs) kept for continuity
    from neural_marionette_tpu.utils.flops import forward_flops
    peak = float(os.environ.get("NM_PEAK_TFLOPS", "197")) * 1e12
    model_flops = forward_flops(cfg, B)
    model_mfu = round(model_flops / dt / peak, 4)

    ref = float(os.environ.get("NM_REF_SEQS_PER_SEC", REF_SEQS_PER_SEC))
    print(json.dumps({
        "metric": "voxel seqs/sec/chip (64^3 encode + VRNN rollout)",
        "value": round(seqs_per_sec, 3),
        "unit": "seqs/sec/chip",
        "vs_baseline": round(seqs_per_sec / ref, 2) if ref > 0 else None,
        "B": B, "dtype": dtype_name, "iters": iters,
        "mfu": mfu,
        "model_mfu": model_mfu,
        "flops_per_iter": flops,
    }))


if __name__ == "__main__":
    main()
