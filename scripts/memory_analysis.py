"""Compile-time HBM analysis of the train step (no execution needed).

Usage: python scripts/memory_analysis.py [B] [grad_accum] [dtype]

Prints XLA's temp/argument/output sizes for the jitted train step at the
flagship AIST config — how the BASELINE.md memory rows are produced, and
the first thing to run when a batch size OOMs (the v5e chip exposes
~15.75G usable HBM; B=4 bf16 remat measures ~13.0G temp, so batch growth
needs grad_accum microbatching).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_marionette_tpu.config import MarionetteConfig, adjust_config
    from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
    from neural_marionette_tpu.ops import voxelize_jnp
    from neural_marionette_tpu.train import (create_train_state,
                                             make_train_step, loss_weights)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dtype_name = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    remat = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    cfg = adjust_config(MarionetteConfig(dataset="aist")).replace(
        remat=remat, grad_accum=accum, compute_dtype=dtype_name)
    model = NeuralMarionette(cfg, dtype=dtype)
    g = np.random.default_rng(0)
    pts = jnp.asarray(g.uniform(-0.8, 0.8, size=(B, cfg.Ttot, 2048, 3)),
                      dtype=jnp.float32)
    batch = voxelize_jnp(pts, cfg.grid_size)
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    # init eagerly executes the forward op-by-op (no XLA liveness
    # optimization) — use a tiny slice; param shapes are batch-independent
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        batch[:1, :2], detector_active=True,
                        learner_active=True, skeleton=sk)
    state = create_train_state(cfg, params, jax.random.PRNGKey(2))
    step = make_train_step(model, cfg, loss_weights(cfg), True, True, True,
                           mesh=None, donate=True)
    ma = step.lower(state, batch, sk).compile().memory_analysis()
    print(f"B={B} accum={accum} {dtype_name} remat={remat}: "
          f"temp={ma.temp_size_in_bytes / 1e9:.2f}G "
          f"args={ma.argument_size_in_bytes / 1e9:.2f}G "
          f"out={ma.output_size_in_bytes / 1e9:.2f}G "
          f"alias={ma.alias_size_in_bytes / 1e9:.2f}G")


if __name__ == "__main__":
    main()
