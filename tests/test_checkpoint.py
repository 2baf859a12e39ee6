"""Orbax checkpoint round-trip, ring buffer, and resume semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
from neural_marionette_tpu.skeleton import Skeleton
from neural_marionette_tpu.train import create_train_state
from neural_marionette_tpu.train.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def state_and_skel():
    cfg = MarionetteConfig(grid_size=32, nkeypoints=4, feat_dim=32,
                           nlatent_kypt=8, nhidden_kypt=16,
                           const_intensity=3, affinity_ver=3, nneighbor=2)
    model = NeuralMarionette(cfg)
    x = jnp.zeros((1, 2, 32, 32, 32, 1))
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        x, detector_active=True, learner_active=True,
                        skeleton=sk)
    state = create_train_state(cfg, params, jax.random.PRNGKey(7))
    skel = Skeleton(A=np.eye(4, dtype=np.float32),
                    priority_values=np.arange(4, dtype=np.float32),
                    priority_indices=np.arange(4, dtype=np.int32),
                    parents=np.array([0, 0, 1, 2], dtype=np.int32))
    return cfg, state, skel


def test_save_restore_roundtrip(state_and_skel, tmp_path):
    cfg, state, skel = state_and_skel
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, state, skel, extra={"note": "x"})
    assert mgr.latest_epoch() == 3
    restored, rskel, meta = mgr.restore(state)
    assert meta["epoch"] == 3 and meta["note"] == "x"
    np.testing.assert_array_equal(rskel.parents, skel.parents)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ring_buffer(state_and_skel, tmp_path):
    cfg, state, skel = state_and_skel
    mgr = CheckpointManager(str(tmp_path), save_que_len=3)
    for e in range(5):
        mgr.save(e, state)
    import os
    kept = sorted(int(d) for d in os.listdir(mgr.ckpt_root) if d.isdigit())
    assert kept == [2, 3, 4]
    assert mgr.latest_epoch() == 4


def test_restore_missing_raises(state_and_skel, tmp_path):
    cfg, state, _ = state_and_skel
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)
