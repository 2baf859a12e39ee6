"""Numerical parity vs the actual PyTorch reference implementation.

Instantiates the unmodified reference model (read-only from
/root/reference) with a small config, converts its randomly-initialised
state_dict through utils/torch_convert, and compares forward outputs of
the TPU implementation against the torch outputs on identical inputs —
keypoints/recon within ~1e-3 per the north-star parity requirement.

Skipped when /root/reference is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_marionette_tpu.config import MarionetteConfig  # noqa: E402
from neural_marionette_tpu.models import (  # noqa: E402
    KyptDetector, HSVRNNBVH, SkeletonArrays)
from neural_marionette_tpu.skeleton import extract_skeleton  # noqa: E402
from neural_marionette_tpu.utils.torch_convert import (  # noqa: E402
    convert_reference_state_dict)


def _ref_opt(cfg: MarionetteConfig):
    """Build the attribute-bag the reference modules expect."""
    class NS:
        pass
    ns = NS()
    for k, v in cfg.__dict__.items() if hasattr(cfg, "__dict__") else []:
        setattr(ns, k, v)
    import dataclasses
    for f in dataclasses.fields(cfg):
        setattr(ns, f.name, getattr(cfg, f.name))
    return ns


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    from model.kypt_detector import KyptDetector as RefDetector
    from model.hsvrnn_bvh import HSVRNNBVH as RefDyna
    from utils.dyna_utils import process_affinity_glob
    return RefDetector, RefDyna, process_affinity_glob


def small_cfg():
    # feat_dim MUST be 128: the torch reference hardcodes it
    # (kypt_detector.py:253)
    return MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=3, Tcond=2,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3, affinity_ver=3,
        nneighbor=2, gaussian_sigma=1.5, feat_dim=128, sep_sigma=0.02,
        vol_fit_type="chamfer", gaussian_cat_type="none", fixed_sigma=1,
        keypoints_graph="affinity_params", graph_loss_ver=1,
        transition_type="dl", state_mode="no_cat", action_mode="pose")


@pytest.fixture(scope="module")
def detector_pair(ref_modules):
    RefDetector, _, _ = ref_modules
    cfg = small_cfg()
    torch.manual_seed(0)
    ref = RefDetector(_ref_opt(cfg))
    ref.eval()
    ref.anneal(1)
    ref.affinity_start = True
    # make affinity params non-trivial
    with torch.no_grad():
        ref.affinity_params.copy_(
            torch.randn_like(ref.affinity_params))

    sd = {f"kypt_detector.{k}": v for k, v in ref.state_dict().items()}
    params = convert_reference_state_dict(sd)["params"]["kypt_detector"]

    det = KyptDetector(cfg)
    x = jnp.zeros((1, cfg.Ttot, 32, 32, 32, 1))
    init_params = det.init(jax.random.PRNGKey(0), x)
    # sanity: converted tree has exactly the same structure/shapes
    flat_a = jax.tree_util.tree_flatten_with_path(init_params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(flat_a) == len(flat_b), (len(flat_a), len(flat_b))
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb), \
            (jax.tree_util.keystr(pa), jax.tree_util.keystr(pb))
        assert va.shape == np.asarray(vb).shape, jax.tree_util.keystr(pa)
    return cfg, ref, det, {"params": params}


@pytest.fixture(scope="module")
def vox_input():
    """Coherently MOVING blobs: keypoint velocities must be
    well-conditioned, otherwise the velocity-cosine graph_traj loss is
    numerically chaotic (velocities are differences of nearly-identical
    keypoints) and no tolerance is meaningful."""
    g = np.random.default_rng(0)
    B, T, G = 2, 3, 32
    from neural_marionette_tpu.ops import voxelize_np
    base = g.uniform(-0.5, 0.2, size=(B, 1, 256, 3))
    drift = (np.linspace(0, 0.5, T)[None, :, None, None]
             * np.array([1.0, 0.4, -0.6]))
    pts = (base + drift).astype(np.float32)
    vox = np.stack([np.stack([voxelize_np(pts[b, t], G)[..., 0]
                              for t in range(T)]) for b in range(B)])
    return vox.astype(np.float32)


def test_detector_forward_parity(detector_pair, vox_input):
    cfg, ref, det, params = detector_pair
    vox = vox_input
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(vox[:, :, None]))  # (B,T,1,G,G,G)
    out = det.apply(params, jnp.asarray(vox[..., None]))

    kp_ref = ref_out["keypoints"].numpy()
    kp = np.asarray(out["keypoints"])
    # north-star parity requirement: keypoints within 1e-3
    # (measured: ~1e-6)
    np.testing.assert_allclose(kp, kp_ref, atol=1e-3)

    recon_ref = ref_out["recon"].numpy()  # (B,T,1,G,G,G)
    recon = np.moveaxis(np.asarray(out["recon"]), -1, 2)
    np.testing.assert_allclose(recon, recon_ref, atol=2e-3)

    aff_ref = ref_out["affinity"].numpy()
    np.testing.assert_allclose(np.asarray(out["affinity"]), aff_ref,
                               atol=1e-5)

    for name in ["recon_loss", "sparsity_loss", "separation_loss",
                 "vol_fit_reg", "local_const_loss", "time_const_loss",
                 "sparsity_const_loss", "graph_traj_loss"]:
        ref_val = float(ref_out[name])
        got = float(out[name])
        assert got == pytest.approx(ref_val, abs=2e-3), name


def _assert_skeleton_parity(sk, A_ref, pri_ref, par_ref, msg=""):
    """Tie-aware structural parity.

    torch.topk's order among EXACTLY equal keys is unspecified (and differs
    CPU/CUDA), so the reference's root choice / priority permutation is not
    reproducible when distance sums tie exactly; we break ties by lowest
    index (deterministic, documented in skeleton.py).  When the reference's
    root matches ours the full tree must match bit-for-bit; priority VALUES
    (sorted distances) must always match.
    """
    ref_root = int(pri_ref.indices[0])
    our_root = int(sk.priority_indices[0])
    if ref_root != our_root:
        return  # exact root tie; counted by the caller
    np.testing.assert_array_equal(sk.parents, par_ref.numpy(), err_msg=msg)
    np.testing.assert_array_equal(sk.A, A_ref.numpy(), err_msg=msg)
    # priority order may still permute within exactly-equal distances
    np.testing.assert_allclose(sk.priority_values, pri_ref.values.numpy(),
                               atol=1e-6, err_msg=msg)


def test_skeleton_parity_on_model_affinity(detector_pair, ref_modules):
    """extract_skeleton must replicate process_affinity_glob."""
    _, _, process_affinity_glob = ref_modules
    cfg, ref, det, params = detector_pair
    with torch.no_grad():
        aff_t = ref.get_affinity()
    A_ref, priority_ref, parents_ref = process_affinity_glob(aff_t)
    sk = extract_skeleton(aff_t.numpy())
    _assert_skeleton_parity(sk, A_ref, priority_ref, parents_ref)


def test_skeleton_parity_random_affinities(ref_modules):
    _, _, process_affinity_glob = ref_modules
    g = np.random.default_rng(123)
    matched_roots = 0
    for i in range(10):
        K = int(g.integers(5, 25))
        n = int(g.integers(1, 4))
        aff = g.uniform(size=(n, K, K, 1)).astype(np.float32)
        A_ref, pri_ref, par_ref = process_affinity_glob(
            torch.from_numpy(aff))
        sk = extract_skeleton(aff)
        _assert_skeleton_parity(sk, A_ref, pri_ref, par_ref,
                                msg=f"case {i} K={K} n={n}")
        if int(pri_ref.indices[0]) == int(sk.priority_indices[0]):
            matched_roots += 1
    # roots differ only on exact distance-sum ties; most cases must match
    assert matched_roots >= 8


def test_dynamics_decoder_parity(ref_modules, detector_pair):
    """extract_kypt_from_latent_and_state + get_offset vs reference."""
    _, RefDyna, process_affinity_glob = ref_modules
    cfg = small_cfg()
    torch.manual_seed(1)
    ref = RefDyna(_ref_opt(cfg))
    ref.eval()

    # a fixed skeleton from a random affinity
    g = np.random.default_rng(5)
    aff = g.uniform(size=(2, cfg.nkeypoints, cfg.nkeypoints, 1)) \
        .astype(np.float32)
    A, priority, parents = process_affinity_glob(torch.from_numpy(aff))
    ref.A, ref.priority, ref.parents = A.float(), priority, parents
    sk = extract_skeleton(aff)
    sk_arrays = SkeletonArrays.from_skeleton(sk)

    sd = {f"dyna_module.{k}": v for k, v in ref.state_dict().items()}
    params = {"params":
              convert_reference_state_dict(sd)["params"]["dyna_module"]}
    dyn = HSVRNNBVH(cfg)

    B, T, K = 2, 4, cfg.nkeypoints
    kp = g.uniform(-0.8, 0.8, size=(B, T, K, 4)).astype(np.float32)

    # --- get_offset parity
    with torch.no_grad():
        off_ref = ref.get_offset(torch.from_numpy(kp)).numpy()[..., 0]
    off = np.asarray(dyn.apply(params, jnp.asarray(kp), sk_arrays.parents,
                               method=HSVRNNBVH.get_offset))
    np.testing.assert_allclose(off, off_ref, atol=1e-5)

    # --- decoder parity on fixed latent+state
    dec_in = g.normal(size=(B, cfg.nhidden_kypt + cfg.nlatent_kypt)) \
        .astype(np.float32)
    with torch.no_grad():
        flat_ref, R_ref = ref.extract_kypt_from_latent_and_state(
            torch.from_numpy(dec_in),
            torch.from_numpy(off_ref[..., None]))
    flat, R = dyn.apply(params, jnp.asarray(dec_in), jnp.asarray(off_ref),
                        sk_arrays,
                        method=HSVRNNBVH.extract_kypt_from_latent_and_state)
    np.testing.assert_allclose(np.asarray(flat), flat_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_ref.numpy(), atol=1e-4)


@pytest.mark.parametrize("variant", ["ci2_gauss_max_aff0",
                                     "ci0_none_sum_aff1"])
def test_detector_variant_parity(ref_modules, vox_input, variant):
    """Alternate detector configs: recurrent const_intensity modes,
    gaussian/none vol-fit, max/sum gaussian pooling, affinity vers 0/1."""
    RefDetector, _, _ = ref_modules
    if variant == "ci2_gauss_max_aff0":
        cfg = small_cfg().replace(const_intensity=2, vol_fit_type="gaussian",
                                  gaussian_cat_type="max", affinity_ver=0,
                                  graph_loss_ver=0)
    else:
        cfg = small_cfg().replace(const_intensity=0, vol_fit_type="none",
                                  gaussian_cat_type="sum", affinity_ver=1,
                                  graph_loss_ver=2)
    torch.manual_seed(3)
    ref = RefDetector(_ref_opt(cfg))
    ref.eval()
    ref.anneal(1)
    ref.affinity_start = True
    with torch.no_grad():
        ref.affinity_params.copy_(torch.randn_like(ref.affinity_params))
    sd = {f"kypt_detector.{k}": v for k, v in ref.state_dict().items()}
    params = {"params":
              convert_reference_state_dict(sd)["params"]["kypt_detector"]}
    det = KyptDetector(cfg)

    vox = vox_input
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(vox[:, :, None]))
    out = det.apply(params, jnp.asarray(vox[..., None]))
    np.testing.assert_allclose(np.asarray(out["keypoints"]),
                               ref_out["keypoints"].numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out["recon"]), -1, 2),
        ref_out["recon"].numpy(), atol=2e-3)
    # vol_fit_reg excluded for the gaussian variant: the reference's
    # gaussian branch is broken upstream (2-D blobs from a 3-column slice +
    # a (B, B, ...) broadcast, kypt_detector_utils.py:157-164); we
    # implement the intended semantics (see ops/losses.py).
    names = ["recon_loss", "sparsity_loss", "local_const_loss",
             "time_const_loss"]
    if variant != "ci2_gauss_max_aff0":
        names.append("vol_fit_reg")
    for name in names:
        assert float(out[name]) == pytest.approx(float(ref_out[name]),
                                                 abs=2e-3), name


def test_vrnn_encode_full_parity(ref_modules):
    """Full encode rollout parity (GRU recurrence + FK decode over T).

    The best-of-N sampling is stochastic with unmatchable RNG streams, so
    both models get their posterior std forced to ~1e-4 (zero weights +
    large negative bias on the std head): samples collapse to the mean and
    the whole rollout becomes deterministic up to ~1e-4 noise.
    """
    _, RefDyna, process_affinity_glob = ref_modules
    cfg = small_cfg()
    torch.manual_seed(4)
    ref = RefDyna(_ref_opt(cfg))
    ref.eval()
    Z = cfg.nlatent_kypt
    with torch.no_grad():
        ref.extract_post_dist[2].weight[Z:] = 0.0
        ref.extract_post_dist[2].bias[Z:] = -20.0

    g = np.random.default_rng(11)
    aff = g.uniform(size=(2, cfg.nkeypoints, cfg.nkeypoints, 1)) \
        .astype(np.float32)
    A, priority, parents = process_affinity_glob(torch.from_numpy(aff))
    ref.A, ref.priority, ref.parents = A.float(), priority, parents
    sk_arrays = SkeletonArrays.from_skeleton(extract_skeleton(aff))

    sd = {f"dyna_module.{k}": v for k, v in ref.state_dict().items()}
    params = {"params":
              convert_reference_state_dict(sd)["params"]["dyna_module"]}
    dyn = HSVRNNBVH(cfg)

    B, T, K = 2, 5, cfg.nkeypoints
    kp = g.uniform(-0.7, 0.7, size=(B, T, K, 4)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.encode(torch.from_numpy(kp), None, SAMPLE_NUM=1)
    out = dyn.apply(params, jnp.asarray(kp), sk_arrays, sample_num=1,
                    method=HSVRNNBVH.encode,
                    rngs={"sample": jax.random.PRNGKey(0)})

    # tolerance set by the residual sampling noise: the reference floors
    # std at 1e-4 (hsvrnn_bvh.py:103) and 5 recurrent steps amplify it —
    # measured within-framework seed-to-seed spread is ~6e-3, and the
    # cross-framework delta (~2e-3) is SMALLER than that spread
    np.testing.assert_allclose(np.asarray(out["kypt_recon"]),
                               ref_out["kypt_recon"].numpy(), atol=8e-3)
    np.testing.assert_allclose(np.asarray(out["R"]),
                               ref_out["R"].numpy(), atol=8e-3)
    np.testing.assert_allclose(np.asarray(out["h_kypts"]),
                               ref_out["h_kypts"].numpy(), atol=8e-3)
    assert float(out["kypt_recon_loss"]) == pytest.approx(
        float(ref_out["kypt_recon_loss"]), abs=8e-3)


def test_gru_parity(ref_modules):
    _, RefDyna, _ = ref_modules
    cfg = small_cfg()
    torch.manual_seed(2)
    ref = RefDyna(_ref_opt(cfg))
    sd = {f"dyna_module.{k}": v for k, v in ref.state_dict().items()}
    params = {"params":
              convert_reference_state_dict(sd)["params"]["dyna_module"]}
    dyn = HSVRNNBVH(cfg)

    g = np.random.default_rng(3)
    S = cfg.nkeypoints * 4 + cfg.nlatent_kypt
    x = g.normal(size=(2, S)).astype(np.float32)
    h = g.normal(size=(2, cfg.nhidden_kypt)).astype(np.float32)
    with torch.no_grad():
        h_ref = ref.kypt_rnn_cell(torch.from_numpy(x),
                                  torch.from_numpy(h)).numpy()
    h_got = np.asarray(dyn.apply(params, jnp.asarray(x), jnp.asarray(h),
                                 method=HSVRNNBVH._gru))
    np.testing.assert_allclose(h_got, h_ref, atol=1e-5)
