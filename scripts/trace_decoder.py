"""Per-op trace of the decoder (strip or plain) in isolation.

Usage: python scripts/trace_decoder.py [frames] [strip|plain] [outdir]
Then:  python scripts/analyze_trace.py <outdir>
One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    use_strip = (sys.argv[2] if len(sys.argv) > 2 else "strip") == "strip"
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/nm_trace_dec"

    from neural_marionette_tpu.models.detector import VoxelDecoder
    from neural_marionette_tpu.utils.profiling import trace

    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(1), (frames, 16, 16, 16, 128),
                          dtype)
    model = VoxelDecoder(feat_dim=128, dtype=dtype, use_strip=use_strip)
    params = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def fwd(p, xx):
        return jnp.sum(model.apply(p, xx).astype(jnp.float32))

    c = fwd.lower(params, x).compile()
    jax.block_until_ready(c(params, x))
    with trace(outdir):
        for _ in range(5):
            out = c(params, x)
        jax.block_until_ready(out)
    print("traced ->", outdir)


if __name__ == "__main__":
    main()
