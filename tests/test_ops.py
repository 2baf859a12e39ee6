"""Unit tests for L2 ops against independent NumPy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu import ops


def rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------- coordconv
def test_add_coord_channels():
    x = jnp.asarray(rng().normal(size=(2, 4, 5, 6, 3)), dtype=jnp.float32)
    out = ops.add_coord_channels(x)
    assert out.shape == (2, 4, 5, 6, 6)
    np.testing.assert_allclose(out[..., :3], x)
    # channel C+0 varies along axis 1 only, etc.
    np.testing.assert_allclose(out[0, :, 0, 0, 3], np.linspace(-1, 1, 4),
                               atol=1e-6)
    np.testing.assert_allclose(out[0, 0, :, 0, 4], np.linspace(-1, 1, 5),
                               atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0, :, 5], np.linspace(-1, 1, 6),
                               atol=1e-6)
    assert np.all(out[1, :, :, :, 3] == out[0, :, :, :, 3])


# -------------------------------------------------------------- soft-argmax
def _softargmax_oracle(heatmap):
    """Loop-based oracle for the reference soft-argmax semantics.

    heatmap: (B, G1, G2, G3, K) numpy.
    """
    B = heatmap.shape[0]
    K = heatmap.shape[-1]
    spatial = heatmap.shape[1:-1]
    intensity = heatmap.mean(axis=(1, 2, 3))  # (B, K)
    intensity = intensity / (intensity.max(axis=-1, keepdims=True) + 1e-6)
    coords = np.zeros((B, K, 3))
    for d in range(3):
        grid = np.linspace(-1, 1, spatial[d])
        for b in range(B):
            for k in range(K):
                h = heatmap[b, ..., k] + 1e-6
                other = tuple(a for a in range(3) if a != d)
                w = h.sum(axis=other)
                w = w / w.sum()
                coords[b, k, d] = (w * grid).sum()
    return np.concatenate([coords, intensity[..., None]], axis=-1)


def test_extract_keypoints_from_heatmap():
    h = rng(1).uniform(0.0, 2.0, size=(2, 6, 7, 8, 4)).astype(np.float32)
    got = np.asarray(ops.extract_keypoints_from_heatmap(jnp.asarray(h)))
    want = _softargmax_oracle(h)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_softargmax_peak_location():
    # a sharp peak at a known voxel should give its coordinate
    G = 16
    h = np.full((1, G, G, G, 1), 1e-4, dtype=np.float32)
    h[0, 4, 8, 12, 0] = 100.0
    kp = np.asarray(ops.extract_keypoints_from_heatmap(jnp.asarray(h)))[0, 0]
    grid = np.linspace(-1, 1, G)
    np.testing.assert_allclose(kp[:3], [grid[4], grid[8], grid[12]], atol=0.02)
    assert kp[3] == pytest.approx(1.0, abs=1e-4)


# ------------------------------------------------------------ gaussian maps
def _gaussian_oracle(kp, sigma, G):
    B, K, _ = kp.shape
    grid = np.linspace(-1, 1, G)
    out = np.ones((B, K, G, G, G))
    width = 2.0 * (np.broadcast_to(np.asarray(sigma, dtype=np.float64), (K,)) / G) ** 2
    for b in range(B):
        for k in range(K):
            gx = np.exp(-((grid - kp[b, k, 0]) ** 2) / width[k])
            gy = np.exp(-((grid - kp[b, k, 1]) ** 2) / width[k])
            gz = np.exp(-((grid - kp[b, k, 2]) ** 2) / width[k])
            out[b, k] = (gx[:, None, None] * gy[None, :, None]
                         * gz[None, None, :]) * kp[b, k, 3]
    return np.moveaxis(out, 1, -1)  # channels-last


def test_render_gaussian_maps_scalar_sigma():
    kp = rng(2).uniform(-0.8, 0.8, size=(2, 3, 4)).astype(np.float32)
    kp[..., 3] = rng(3).uniform(0.2, 1.0, size=(2, 3))
    got = np.asarray(ops.render_gaussian_maps(jnp.asarray(kp), 1.5, 8))
    want = _gaussian_oracle(kp, 1.5, 8)
    assert got.shape == (2, 8, 8, 8, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_gaussian_maps_per_k_sigma_and_batch_dims():
    kp = rng(4).uniform(-0.5, 0.5, size=(2, 5, 3, 4)).astype(np.float32)
    sig = np.array([1.0, 2.0, 0.5], dtype=np.float32)
    got = np.asarray(ops.render_gaussian_maps(jnp.asarray(kp), sig, 8))
    assert got.shape == (2, 5, 8, 8, 8, 3)
    want = _gaussian_oracle(kp.reshape(10, 3, 4), sig, 8).reshape(
        2, 5, 8, 8, 8, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------- rotations
def test_rotation_6d_orthonormal():
    p = jnp.asarray(rng(5).normal(size=(4, 7, 6)), dtype=jnp.float32)
    R = np.asarray(ops.rotation_6d_to_matrix(p))
    eye = np.eye(3)
    for r in R.reshape(-1, 3, 3):
        np.testing.assert_allclose(r.T @ r, eye, atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_rotation_6d_identity():
    p = jnp.asarray([[1, 0, 0, 0, 1, 0]], dtype=jnp.float32)
    R = np.asarray(ops.rotation_6d_to_matrix(p))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


# ----------------------------------------------------------------------- FK
def test_fk_against_dict_walk():
    K, B = 6, 2
    parents = np.array([0, 0, 1, 1, 3, 0], dtype=np.int32)
    priority = np.array([0, 1, 5, 2, 3, 4], dtype=np.int32)
    p6d = rng(6).normal(size=(B, K, 6)).astype(np.float32)
    offset = rng(7).normal(size=(B, K, 3)).astype(np.float32)
    root_pos = rng(8).normal(size=(B, 3)).astype(np.float32)

    R_local = np.asarray(ops.rotation_6d_to_matrix(jnp.asarray(p6d)))
    # dict-walk oracle
    Rg = {0: R_local[:, 0]}
    for idx in priority[1:]:
        Rg[int(idx)] = Rg[int(parents[idx])] @ R_local[:, idx]
    pos = {0: root_pos}
    for idx in priority[1:]:
        pos[int(idx)] = (Rg[int(idx)] @ offset[:, idx, :, None])[..., 0] \
            + pos[int(parents[idx])]

    Rg_got = np.asarray(ops.fk_global_rotations(
        jnp.asarray(R_local), jnp.asarray(priority), jnp.asarray(parents)))
    pos_got = np.asarray(ops.fk_positions(
        jnp.asarray(Rg_got), jnp.asarray(offset), jnp.asarray(root_pos),
        jnp.asarray(priority), jnp.asarray(parents)))
    for k in range(K):
        np.testing.assert_allclose(Rg_got[:, k], Rg[k], atol=1e-5)
        np.testing.assert_allclose(pos_got[:, k], pos[k], atol=1e-5)


def test_fk_inverse_composition():
    K = 4
    parents = np.array([0, 0, 1, 2], dtype=np.int32)
    priority = np.array([0, 1, 2, 3], dtype=np.int32)
    p6d = rng(9).normal(size=(1, K, 6)).astype(np.float32)
    R = np.asarray(ops.rotation_6d_to_matrix(jnp.asarray(p6d)))
    Rg_inv = np.asarray(ops.fk_global_rotations(
        jnp.asarray(R), jnp.asarray(priority), jnp.asarray(parents),
        inverse=True))
    # inverse=True composes child-first: Rg[3] = R3 @ R2 @ R1 @ R0
    want = R[:, 3] @ R[:, 2] @ R[:, 1] @ R[:, 0]
    np.testing.assert_allclose(Rg_inv[:, 3], want, atol=1e-5)


def _random_tree(seed, K, root):
    """Random parents array forming a tree rooted at ``root`` (parent==self),
    plus a root-first priority order (each parent precedes its children)."""
    r = rng(seed)
    order = [root] + list(r.permutation([k for k in range(K) if k != root]))
    parents = np.zeros(K, dtype=np.int32)
    parents[root] = root
    for i, k in enumerate(order[1:], start=1):
        parents[k] = order[int(r.integers(0, i))]
    return parents, np.asarray(order, dtype=np.int32)


@pytest.mark.parametrize("seed,K,root,inverse", [
    (11, 24, 0, False), (12, 24, 7, True), (13, 5, 3, False),
    (14, 2, 1, True), (15, 17, 16, False),
])
def test_fk_parallel_matches_scan_random_trees(seed, K, root, inverse):
    parents, priority = _random_tree(seed, K, root)
    B = 3
    p6d = rng(seed + 100).normal(size=(B, K, 6)).astype(np.float32)
    offset = rng(seed + 200).normal(size=(B, K, 3)).astype(np.float32)
    root_pos = rng(seed + 300).normal(size=(B, 3)).astype(np.float32)
    R_local = ops.rotation_6d_to_matrix(jnp.asarray(p6d))
    pr, pa = jnp.asarray(priority), jnp.asarray(parents)

    Rg_scan = ops.fk_global_rotations(R_local, pr, pa, inverse=inverse)
    Rg_par = ops.fk_global_rotations_parallel(R_local, pr, pa,
                                              inverse=inverse)
    np.testing.assert_allclose(np.asarray(Rg_par), np.asarray(Rg_scan),
                               atol=1e-5)
    if not inverse:
        pos_scan = ops.fk_positions(Rg_scan, jnp.asarray(offset),
                                    jnp.asarray(root_pos), pr, pa)
        pos_par = ops.fk_positions_parallel(Rg_scan, jnp.asarray(offset),
                                            jnp.asarray(root_pos), pr, pa)
        np.testing.assert_allclose(np.asarray(pos_par), np.asarray(pos_scan),
                                   atol=1e-5)


def test_fk_parallel_deep_chain():
    """Worst case for pointer doubling: a K-1-deep pure chain."""
    K = 24
    parents = np.concatenate([[0], np.arange(K - 1)]).astype(np.int32)
    priority = np.arange(K, dtype=np.int32)
    p6d = rng(21).normal(size=(2, K, 6)).astype(np.float32)
    offset = rng(22).normal(size=(2, K, 3)).astype(np.float32)
    root_pos = rng(23).normal(size=(2, 3)).astype(np.float32)
    R_local = ops.rotation_6d_to_matrix(jnp.asarray(p6d))
    pr, pa = jnp.asarray(priority), jnp.asarray(parents)
    Rg_scan = ops.fk_global_rotations(R_local, pr, pa)
    Rg_par = ops.fk_global_rotations_parallel(R_local, pr, pa)
    np.testing.assert_allclose(np.asarray(Rg_par), np.asarray(Rg_scan),
                               atol=2e-5)
    pos_scan = ops.fk_positions(Rg_scan, jnp.asarray(offset),
                                jnp.asarray(root_pos), pr, pa)
    pos_par = ops.fk_positions_parallel(Rg_scan, jnp.asarray(offset),
                                        jnp.asarray(root_pos), pr, pa)
    np.testing.assert_allclose(np.asarray(pos_par), np.asarray(pos_scan),
                               atol=2e-5)


# ------------------------------------------------------------------- voxelize
def test_voxelize_np_matches_jnp():
    pts = rng(10).uniform(-1, 1, size=(500, 3)).astype(np.float32)
    a = ops.voxelize_np(pts, 16)
    b = np.asarray(ops.voxelize_jnp(jnp.asarray(pts), 16))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 16, 16, 1)
    assert a.sum() > 0
    assert set(np.unique(a)) <= {0.0, 1.0}


def test_voxelize_reference_semantics():
    # point at exactly -1 lands in cell 0; at exactly +1 in the last cell
    pts = np.array([[-1, -1, -1], [1, 1, 1], [0, 0, 0]], dtype=np.float32)
    g = ops.voxelize_np(pts, 8)
    assert g[0, 0, 0, 0] == 1.0
    assert g[7, 7, 7, 0] == 1.0
    # 0 -> ((0+1)/(0.25+1e-5)) = 3.99... -> cell 3
    assert g[3, 3, 3, 0] == 1.0


def test_voxelize_jnp_batched():
    pts = rng(11).uniform(-1, 1, size=(2, 3, 100, 3)).astype(np.float32)
    g = ops.voxelize_jnp(jnp.asarray(pts), 8)
    assert g.shape == (2, 3, 8, 8, 8, 1)


def test_voxelize_jnp_oob_dropped():
    pts = np.array([[5.0, 5.0, 5.0], [0.0, 0.0, 0.0]], dtype=np.float32)
    g = np.asarray(ops.voxelize_jnp(jnp.asarray(pts), 8))
    assert g.sum() == 1.0  # only the in-range point lands


# --------------------------------------------------------------------- losses
def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    recon = rng(12).uniform(1e-4, 1 - 1e-4, size=(2, 3, 4, 4, 4, 1)).astype(
        np.float32)
    target = (rng(13).uniform(size=(2, 3, 4, 4, 4, 1)) > 0.5).astype(
        np.float32)
    got = np.asarray(ops.bce_recon_loss(jnp.asarray(recon),
                                        jnp.asarray(target)))
    want = torch.nn.BCELoss(reduction="none")(
        torch.from_numpy(recon), torch.from_numpy(target)).mean(
            dim=(2, 3, 4, 5)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temporal_separation_loss_zero_for_static():
    # identical displacements => max similarity => loss ~ 1 scaled
    kp = np.zeros((2, 5, 4, 4), dtype=np.float32)
    kp[..., :3] = rng(14).normal(size=(2, 1, 4, 3))  # static in time
    loss = np.asarray(ops.temporal_separation_loss(jnp.asarray(kp), 0.02))
    # all displacements are zero -> difference zero -> exp(0)=1 off-diag
    np.testing.assert_allclose(loss, np.ones(2), atol=1e-5)


def test_volume_fitting_chamfer():
    # single occupied voxel at a keypoint location -> zero loss
    G = 8
    seq = np.zeros((1, 1, G, G, G, 1), dtype=np.float32)
    grid = np.linspace(-1, 1, G)
    seq[0, 0, 2, 3, 4, 0] = 1.0
    kp = np.zeros((1, 1, 2, 4), dtype=np.float32)
    kp[0, 0, 0, :3] = [grid[2], grid[3], grid[4]]
    kp[0, 0, 1, :3] = [0.9, 0.9, 0.9]  # far keypoint, should not matter
    loss = np.asarray(ops.volume_fitting_loss(
        jnp.asarray(seq), jnp.asarray(kp), 1.5, "chamfer"))
    np.testing.assert_allclose(loss, np.zeros((1, 1)), atol=1e-6)

    # move the keypoint one voxel away -> loss = step^2
    kp[0, 0, 0, 0] = grid[3]
    kp[0, 0, 1, :3] = [5, 5, 5]
    loss = np.asarray(ops.volume_fitting_loss(
        jnp.asarray(seq), jnp.asarray(kp), 1.5, "chamfer"))
    step = grid[1] - grid[0]
    np.testing.assert_allclose(loss, [[step ** 2]], rtol=1e-5)


def test_graph_consistency_shapes_and_ver1():
    B, T, K, n = 2, 4, 5, 2
    kp = rng(15).normal(size=(B, T, K, 4)).astype(np.float32)
    aff = rng(16).uniform(size=(n, K, K, 1)).astype(np.float32)
    local, time_l, sp, inten = ops.graph_consistency_losses(
        jnp.asarray(kp), jnp.asarray(aff), ver=1)
    assert local.shape == (B, T) and time_l.shape == (B, T)
    assert sp.shape == (1, 1) and inten.shape == (1, 1)
    assert float(inten.sum()) == 0.0
    # oracle for ver=1 local term
    infl = aff[..., 0].max(axis=0)
    pos = kp[..., :3]
    dist = ((pos[:, :, :, None] - pos[:, :, None]) ** 2).sum(-1)
    want = (dist * infl[None, None]).mean(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(local), want, rtol=1e-5)


def test_graph_trajectory_loss_matches_torch_cosine():
    torch = pytest.importorskip("torch")
    B, T, K, n = 2, 6, 4, 2
    kp = rng(17).normal(size=(B, T, K, 4)).astype(np.float32)
    aff = rng(18).uniform(size=(n, K, K, 1)).astype(np.float32)
    got = float(np.asarray(ops.graph_trajectory_loss(
        jnp.asarray(kp), jnp.asarray(aff), ver=1)))

    tkp = torch.from_numpy(kp)
    infl = torch.from_numpy(aff[..., 0]).max(dim=0).values[None, None]
    vel = tkp[:, 1:, :, :3] - tkp[:, :-1, :, :3]
    acc = vel[:, 1:] - vel[:, :-1]
    cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
    vel_cos = ((-cos(vel[:, :, :, None], vel[:, :, None]) + 1) / 2 * infl
               ).mean(dim=(0, 1))
    acc_cos = ((-cos(acc[:, :, :, None], acc[:, :, None]) + 1) / 2 * infl
               ).mean(dim=(0, 1))
    want = float((vel_cos + acc_cos).mean())
    assert got == pytest.approx(want, abs=1e-5)


def test_gaussian_kl_matches_torch():
    torch = pytest.importorskip("torch")
    mq = rng(19).normal(size=(3, 8)).astype(np.float32)
    sq = rng(20).uniform(0.1, 2.0, size=(3, 8)).astype(np.float32)
    mp = rng(21).normal(size=(3, 8)).astype(np.float32)
    sp = rng(22).uniform(0.1, 2.0, size=(3, 8)).astype(np.float32)
    got = np.asarray(ops.gaussian_kl(*map(jnp.asarray, (mq, sq, mp, sp))))
    want = torch.distributions.kl.kl_divergence(
        torch.distributions.Normal(torch.from_numpy(mq), torch.from_numpy(sq)),
        torch.distributions.Normal(torch.from_numpy(mp), torch.from_numpy(sp)),
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample2_trilinear_matches_resize():
    from neural_marionette_tpu.ops.upsample import upsample2_trilinear
    g = np.random.default_rng(30)
    x = jnp.asarray(g.normal(size=(2, 5, 6, 7, 3)), dtype=jnp.float32)
    got = np.asarray(upsample2_trilinear(x))
    want = np.asarray(jax.image.resize(
        x, (2, 10, 12, 14, 3), method="linear"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxelize_strict_checkify():
    pts_ok = jnp.asarray(rng(40).uniform(-0.9, 0.9, size=(50, 3)),
                         dtype=jnp.float32)
    out = ops.voxelize_jnp(pts_ok, 16, strict=True)
    assert out.shape == (16, 16, 16, 1)
    pts_bad = jnp.asarray([[5.0, 0.0, 0.0]], dtype=jnp.float32)
    with pytest.raises(Exception, match="out of"):
        ops.voxelize_jnp(pts_bad, 16, strict=True)
