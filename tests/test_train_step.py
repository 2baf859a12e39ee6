"""End-to-end training slice on the virtual 8-device CPU mesh.

SURVEY.md §7.2 milestone 4: synthetic point clouds -> on-device voxelize ->
detector forward -> weighted losses -> masked Adam step over a sharded
mesh; the loss decreases and frozen params stay frozen.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
from neural_marionette_tpu.ops import voxelize_jnp
from neural_marionette_tpu.parallel import make_mesh, shard_batch, replicate
from neural_marionette_tpu.skeleton import extract_skeleton
from neural_marionette_tpu.train import (
    LossScheduler, create_train_state, make_train_step, make_eval_step,
    make_generate_step, loss_weights, set_learning_rate)


def tiny_cfg(**kw):
    base = dict(grid_size=32, nkeypoints=6, input_dim=3, Ttot=4, Tcond=2,
                nlatent_kypt=16, nhidden_kypt=32, const_intensity=3,
                affinity_ver=3, nneighbor=2, gaussian_sigma=1.5,
                feat_dim=32,
                lrate=1e-3, max_grad_norm=30.0)
    base.update(kw)
    return MarionetteConfig(**base)


def make_batch(B=4, T=4, G=32, seed=0):
    g = np.random.default_rng(seed)
    # a coherent blob that translates over time (learnable structure)
    base = g.uniform(-0.4, 0.4, size=(B, 1, 128, 3))
    drift = np.linspace(-0.3, 0.3, T)[None, :, None, None] * np.array(
        [1.0, 0.5, 0.0])
    pts = (base + drift).astype(np.float32)
    return voxelize_jnp(jnp.asarray(pts), G)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    mesh = make_mesh(data=4, model=2)
    model = NeuralMarionette(cfg)
    batch = make_batch()
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        batch, detector_active=True, learner_active=True,
                        skeleton=sk)
    return cfg, mesh, model, batch, sk, params


def test_detector_phase_loss_decreases(setup):
    cfg, mesh, model, batch, sk, params = setup
    sched = LossScheduler(cfg)
    sched.anneal(0)
    assert sched.module_actives["detector"] is True
    assert sched.module_actives["learner"] is False

    state = create_train_state(cfg, replicate(mesh, params),
                               jax.random.PRNGKey(42))
    step = make_train_step(model, cfg, sched.active_weights(),
                           detector_active=True, learner_active=False,
                           affinity_active=sched.affinity_active,
                           mesh=mesh, donate=False)
    sharded = shard_batch(mesh, batch)
    losses = []
    for _ in range(6):
        state, metrics = step(state, sharded, None)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # learner losses are zero in this phase
    assert float(metrics["kypt_recon_loss"]) == 0.0


def test_learner_phase_detector_frozen(setup):
    cfg, mesh, model, batch, sk, params = setup
    # pretrained_mode=1 semantics: detector frozen, learner training
    state = create_train_state(cfg, replicate(mesh, params),
                               jax.random.PRNGKey(7))
    weights = loss_weights(cfg)
    step = make_train_step(model, cfg, weights,
                           detector_active=False, learner_active=True,
                           affinity_active=True, mesh=mesh, donate=False)
    sharded = shard_batch(mesh, batch)
    det_before = jax.tree.map(
        np.asarray, state.params["params"]["kypt_detector"])
    dyn_before = jax.tree.map(
        np.asarray, state.params["params"]["dyna_module"])
    for _ in range(2):
        state, metrics = step(state, sharded, sk)
    det_after = state.params["params"]["kypt_detector"]
    dyn_after = state.params["params"]["dyna_module"]
    # detector untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        det_before, det_after)
    # dynamics moved (except frozen offset_param)
    np.testing.assert_array_equal(
        np.asarray(dyn_before["offset_param"]),
        np.asarray(dyn_after["offset_param"]))
    moved = sum(
        0 if np.array_equal(np.asarray(a), np.asarray(b)) else 1
        for a, b in zip(jax.tree.leaves(dyn_before),
                        jax.tree.leaves(dyn_after)))
    assert moved > 5
    assert np.isfinite(float(metrics["kypt_recon_loss"]))


def test_skeleton_from_trained_affinity(setup):
    """Host skeleton extraction consumes the model's affinity output."""
    cfg, mesh, model, batch, sk, params = setup
    det = model.apply(params, batch, detector_active=True,
                      learner_active=False, affinity_active=True,
                      rngs={"sample": jax.random.PRNGKey(0)})
    aff = np.asarray(det["affinity"])
    skel = extract_skeleton(aff)
    assert skel.parents.shape == (cfg.nkeypoints,)
    sk2 = SkeletonArrays.from_skeleton(skel)
    out = model.apply(params, batch, detector_active=True,
                      learner_active=True, affinity_active=True,
                      skeleton=sk2, rngs={"sample": jax.random.PRNGKey(1)})
    assert np.isfinite(float(out["kypt_recon_loss"]))


def test_eval_and_generate_steps(setup):
    cfg, mesh, model, batch, sk, params = setup
    weights = loss_weights(cfg)
    eval_step = make_eval_step(model, cfg, weights, True, True, True,
                               mesh=mesh)
    metrics, tensors = eval_step(params, shard_batch(mesh, batch), sk,
                                 jax.random.PRNGKey(0))
    assert "recon" in tensors and "keypoints" in tensors
    assert np.isfinite(float(metrics["total_loss"]))

    gen_step = make_generate_step(model, cfg, mesh=mesh, sample_num=3)
    gen = gen_step(params, shard_batch(mesh, batch), sk,
                   jax.random.PRNGKey(1))
    assert gen["gen"].shape == batch.shape


def test_set_learning_rate(setup):
    cfg, mesh, model, batch, sk, params = setup
    state = create_train_state(cfg, params, jax.random.PRNGKey(0))
    state = set_learning_rate(state, 1e-5)
    assert float(state.opt_state.hyperparams["learning_rate"]) == \
        pytest.approx(1e-5)


def test_reset_optimizer(setup):
    """cfg.opt_reset_per_epoch parity path: fresh Adam moments, LR and
    params preserved (reference recreates its optimizer every epoch,
    reference train.py:366-374)."""
    from neural_marionette_tpu.train import reset_optimizer
    cfg, mesh, model, batch, sk, params = setup
    state = create_train_state(cfg, params, jax.random.PRNGKey(0))
    state = set_learning_rate(state, 3e-4)
    # dirty every moment leaf, as real updates would
    dirty = jax.tree.map(lambda x: jnp.ones_like(x) if x.ndim else x,
                         state.opt_state.inner_state)
    state = state.replace(
        opt_state=state.opt_state._replace(inner_state=dirty))
    out = reset_optimizer(cfg, state)
    for leaf in jax.tree.leaves(out.opt_state.inner_state):
        assert float(jnp.abs(jnp.asarray(leaf, jnp.float32)).max()) == 0.0
    assert float(out.opt_state.hyperparams["learning_rate"]) == \
        pytest.approx(3e-4)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((a == b).all()), out.params, state.params))


def test_scheduler_phases():
    cfg = tiny_cfg(detector_start=0, detector_end=10, learner_start=10,
                   affinity_anneal=5, nepoch=20)
    sched = LossScheduler(cfg)
    sched.anneal(0)
    assert sched.module_actives == {"detector": True, "learner": False}
    assert not sched.affinity_active
    assert "recon_loss" in sched.current_loss_names
    assert "kl_kypt" not in sched.current_loss_names
    sched.anneal(5)
    assert sched.affinity_active
    sched.anneal(12)
    assert sched.module_actives == {"detector": False, "learner": True}
    assert "kl_kypt" in sched.current_loss_names
    assert "recon_loss" not in sched.current_loss_names
    # staged LR
    cfg2 = tiny_cfg(firstdecay=2, seconddecay=4, lrate=1.0)
    s2 = LossScheduler(cfg2)
    assert s2.learning_rate(0) == 1.0
    assert s2.learning_rate(2) == 0.25
    assert s2.learning_rate(4) == 0.1


def test_grad_accum_matches_full_batch():
    """With the detector-only phase (deterministic: affinity ver 3, no
    sampling losses), grad accumulation over microbatches must produce
    the same update as the full batch (all losses are batch means)."""
    import jax
    import jax.numpy as jnp
    cfg = tiny_cfg(detector_start=0, learner_start=int(1e9),
                   affinity_anneal=0)
    model = NeuralMarionette(cfg)
    g = np.random.default_rng(0)
    pts = jnp.asarray(g.uniform(-0.8, 0.8, size=(4, cfg.Ttot, 128, 3)),
                      dtype=jnp.float32)
    from neural_marionette_tpu.ops import voxelize_jnp
    batch = voxelize_jnp(pts, cfg.grid_size)
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        batch, detector_active=True, learner_active=False,
                        skeleton=sk)
    w = loss_weights(cfg)

    outs = {}
    for accum in (1, 2):
        c = cfg.replace(grad_accum=accum)
        state = create_train_state(c, params, jax.random.PRNGKey(7))
        step = make_train_step(model, c, w, detector_active=True,
                               learner_active=False, affinity_active=True,
                               mesh=None, donate=False)
        new_state, metrics = step(state, batch, sk)
        outs[accum] = (new_state.params, float(metrics["total_loss"]))

    assert outs[1][1] == pytest.approx(outs[2][1], rel=1e-5)
    flat1 = jax.tree_util.tree_leaves(outs[1][0])
    flat2 = jax.tree_util.tree_leaves(outs[2][0])
    # Adam's update direction is discontinuous for near-zero gradients
    # (update -> +-lr as v -> 0), so a handful of elements can flip on
    # float-association noise between the two summation orders; require
    # the overwhelming majority to match plus the exact loss match above.
    total = mismatched = 0
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > 5e-5 + 1e-2 * np.abs(b)
        mismatched += int(bad.sum())
        total += a.size
    assert mismatched <= max(total // 1000, 3), \
        f"{mismatched}/{total} param elements diverged"
