"""Facade API smoke test on a tiny random-weight model."""
import numpy as np

from neural_marionette_tpu.api import Marionette
from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.apps.common import synthetic_clip


def test_facade_end_to_end():
    cfg = MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=6, Tcond=2,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3, affinity_ver=3,
        nneighbor=2, feat_dim=32, dataset="synthetic")
    m = Marionette.from_config(cfg)
    vox, pts = synthetic_clip(cfg, seq_len=12, seed=0)

    det = m.detect(vox)
    assert det["keypoints"].shape == (6, 6, 4)
    assert m.skeleton is not None

    enc = m.encode(vox)
    assert enc["R"].shape == (6, 6, 3, 3)

    gen = m.generate(vox, Tcond=2, Tgen=2, sample_num=2, seed=0)
    assert gen["gen_voxels"].shape[1] == 4

    ret = m.retarget(vox, pts[0], seed=0)
    assert np.isfinite(ret["result"].new_points).all()
