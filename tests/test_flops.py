"""Validate the analytic model-FLOPs counter against XLA's own cost
analysis on a tiny plain-path config (no strip/upconv/chunk distortion).

The counter (utils/flops.py) backs MFU reporting in bench.py /
scripts/bench_train.py; if the architecture changes, this differential
catches a stale counter.
"""
import numpy as np
import jax
import jax.numpy as jnp

from neural_marionette_tpu.config import MarionetteConfig


def test_forward_flops_matches_xla_cost_analysis():
    from neural_marionette_tpu.models import KyptDetector
    from neural_marionette_tpu.utils.flops import forward_flops

    cfg = MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=4, Tcond=2,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3,
        affinity_ver=3, nneighbor=2, feat_dim=32, dataset="synthetic",
        strip_encoder=0, strip_decoder=0, upconv_decoder=0, frame_chunk=0)
    B = 2
    det = KyptDetector(cfg)
    g = np.random.default_rng(0)
    vox = jnp.asarray(
        (g.random((B, cfg.Ttot, 32, 32, 32, 1)) < 0.05).astype(np.float32))
    params = det.init(jax.random.PRNGKey(0), vox)

    def fwd(p, v):
        out = det.apply(p, v)
        return out["recon"], out["keypoints"], out["recon_loss"]

    compiled = jax.jit(fwd).lower(params, vox).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca["flops"])
    model_flops = forward_flops(cfg, B)
    # XLA counts the conv/matmul terms plus elementwise noise the counter
    # deliberately omits; agreement within 10% at a config where no
    # padding/Toeplitz FLOPs exist validates the inventory
    assert abs(model_flops - xla_flops) / xla_flops < 0.10, \
        (model_flops, xla_flops)


def test_train_flops_is_3x_forward():
    from neural_marionette_tpu.utils.flops import (forward_flops,
                                                   train_step_flops, mfu)
    cfg = MarionetteConfig(grid_size=32, feat_dim=32, nkeypoints=6,
                           Ttot=4, const_intensity=3)
    assert train_step_flops(cfg, 4) == 3.0 * forward_flops(cfg, 4)
    assert abs(mfu(197e12 * 0.5, 1.0) - 0.5) < 1e-9
