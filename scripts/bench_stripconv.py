"""Hardware A/B of the strip-packed decoder vs the plain XLA conv path.

Usage: python scripts/bench_stripconv.py [frames] [iters] [dtype]
One TPU process at a time (CLAUDE.md).  Timing via
utils.profiling.loop_time (loop-amortized; per-call timing through the
axon tunnel is unreliable).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = jnp.bfloat16 if (len(sys.argv) <= 3 or sys.argv[3] != "float32") \
        else jnp.float32

    from neural_marionette_tpu.models.detector import VoxelDecoder
    from neural_marionette_tpu.utils.profiling import loop_time

    x = jax.random.normal(jax.random.PRNGKey(1), (frames, 16, 16, 16, 128),
                          dtype)
    only = os.environ.get("NM_BENCH_ONLY", "")  # "plain" / "strip" / ""
    results = {}
    for name, use_strip in [("plain", False), ("strip", True)]:
        if only and name != only:
            continue
        model = VoxelDecoder(feat_dim=128, dtype=dtype, use_strip=use_strip)
        params = model.init(jax.random.PRNGKey(0), x[:1])

        dt = loop_time(lambda xx: model.apply(params, xx), x, iters=iters)
        results[name] = dt
        print(f"{name:6s} fwd    : {dt*1e3:8.2f} ms", flush=True)

        def loss(p, xx):
            return jnp.sum(jnp.square(model.apply(p, xx)
                                      .astype(jnp.float32)))
        try:
            dtb = loop_time(lambda xx: jax.grad(loss, argnums=1)(params, xx),
                            x, iters=iters)
        except Exception as e:  # large-frame bwd can OOM at compile
            print(f"{name:6s} fwd+bwd: FAILED ({type(e).__name__})",
                  flush=True)
            continue
        results[name + "_bwd"] = dtb
        print(f"{name:6s} fwd+bwd: {dtb*1e3:8.2f} ms (d/dx)", flush=True)

    if "plain" in results and "strip" in results:
        print(f"speedup fwd: {results['plain']/results['strip']:.2f}x",
              flush=True)
        if "plain_bwd" in results and "strip_bwd" in results:
            print(f"speedup fwd+bwd: "
                  f"{results['plain_bwd']/results['strip_bwd']:.2f}x")


if __name__ == "__main__":
    main()
