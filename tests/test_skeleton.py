"""Tests for affinity -> skeleton extraction (tree structure + invariants)."""
import numpy as np
import pytest

from neural_marionette_tpu.skeleton import extract_skeleton, Skeleton


def _chain_affinity(K, n=2):
    """Affinity strongly favoring a chain 0-1-2-...-(K-1)."""
    aff = np.zeros((n, K, K), dtype=np.float32)
    for k in range(K):
        if k + 1 < K:
            aff[0, k, k + 1] = 1.0
        if k - 1 >= 0:
            aff[1, k, k - 1] = 0.9
    aff += 1e-3  # small background so topk is well-defined
    return aff[..., None]


def _check_invariants(sk: Skeleton, K: int):
    # root is its own parent; exactly one root
    roots = [k for k in range(K) if sk.parents[k] == k]
    assert len(roots) == 1
    root = roots[0]
    assert sk.priority_indices[0] == root
    assert sk.priority_values[0] == 0.0
    # priority values ascending
    assert np.all(np.diff(sk.priority_values) >= 0)
    # every child's parent appears earlier in the priority order (FK invariant)
    order = {int(j): i for i, j in enumerate(sk.priority_indices)}
    for k in range(K):
        if k != root:
            assert order[int(sk.parents[k])] < order[k], \
                f"parent of {k} not before it in priority order"
    # adjacency symmetric, matches parents, K-1 edges
    assert np.array_equal(sk.A, sk.A.T)
    assert sk.A.sum() == 2 * (K - 1)
    for k in range(K):
        if k != root:
            assert sk.A[k, sk.parents[k]] == 1.0
    # tree connectivity: all nodes reachable from root by walking parents
    for k in range(K):
        seen, cur = set(), k
        while cur != root:
            assert cur not in seen, "cycle in parents"
            seen.add(cur)
            cur = int(sk.parents[cur])


def test_chain_skeleton():
    K = 8
    sk = extract_skeleton(_chain_affinity(K))
    _check_invariants(sk, K)
    # chain graph: distances from whichever mid root are contiguous along chain
    # parents should follow the chain toward the root
    root = int(sk.priority_indices[0])
    for k in range(K):
        if k == root:
            continue
        assert abs(int(sk.parents[k]) - k) == 1


def test_star_skeleton():
    # nneighbor=1: each leaf's single strongest neighbor is the hub 0, so
    # the symmetrized adjacency is exactly a star -> hub is the root.
    K = 6
    aff = np.zeros((1, K, K), dtype=np.float32)
    for i in range(K):
        for j in range(K):
            aff[0, i, j] = 1e-4 * (i * K + j)  # distinct weak background
    for k in range(1, K):
        aff[0, k, 0] = 1.0
        aff[0, 0, k] = 0.5 + 0.01 * k
    sk = extract_skeleton(aff[..., None])
    _check_invariants(sk, K)
    assert int(sk.priority_indices[0]) == 0
    for k in range(1, K):
        assert int(sk.parents[k]) == 0


def test_disconnected_components_bridged():
    # two cliques {0,1,2} and {3,4,5} with no cross edges
    K = 6
    aff = np.zeros((2, K, K), dtype=np.float32)
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in grp:
            for j in grp:
                if i != j:
                    aff[0, i, j] = 1.0
                    aff[1, i, j] = 0.5
    sk = extract_skeleton(aff[..., None])
    _check_invariants(sk, K)  # connectivity implies the bridge worked


@pytest.mark.parametrize("seed", range(12))
def test_random_affinity_invariants(seed):
    g = np.random.default_rng(seed)
    K = int(g.integers(4, 25))
    n = int(g.integers(1, 4))
    aff = g.uniform(size=(n, K, K, 1)).astype(np.float32)
    sk = extract_skeleton(aff)
    _check_invariants(sk, K)


def test_deterministic():
    g = np.random.default_rng(42)
    aff = g.uniform(size=(2, 24, 24, 1)).astype(np.float32)
    a = extract_skeleton(aff)
    b = extract_skeleton(aff)
    assert np.array_equal(a.parents, b.parents)
    assert np.array_equal(a.priority_indices, b.priority_indices)
    assert np.array_equal(a.A, b.A)


def test_networkx_shortest_path_oracle():
    """Our scipy all-pairs distances must match a networkx computation."""
    nx = pytest.importorskip("networkx")
    from neural_marionette_tpu.skeleton import _all_pairs_shortest, BIG_NUM
    g = np.random.default_rng(7)
    K = 15
    mask = (g.uniform(size=(K, K)) > 0.7).astype(np.float64)
    mask = np.maximum(mask, mask.T)
    np.fill_diagonal(mask, 0)
    weights = np.ones_like(mask) + g.uniform(0, 1e-4, size=(K, K))
    weights = (weights + weights.T) / 2

    got = _all_pairs_shortest(mask, weights)

    G = nx.Graph()
    G.add_nodes_from(range(K))
    for i in range(K):
        for j in range(K):
            if mask[i, j]:
                G.add_edge(i, j, weight=weights[i, j])
    want = np.full((K, K), BIG_NUM)
    for src, lengths in nx.all_pairs_dijkstra_path_length(G):
        for dst, d in lengths.items():
            want[src, dst] = d
    np.testing.assert_allclose(got, want, atol=1e-9)


# ---------------------------------------------------------------- on-device
def _assert_matches_host(aff):
    import jax
    from neural_marionette_tpu.skeleton_device import extract_skeleton_device
    host = extract_skeleton(np.asarray(aff))
    dev = jax.jit(extract_skeleton_device)(aff)
    np.testing.assert_array_equal(np.asarray(dev.parents), host.parents)
    np.testing.assert_array_equal(np.asarray(dev.priority_indices),
                                  host.priority_indices)
    np.testing.assert_array_equal(np.asarray(dev.A), host.A)
    np.testing.assert_allclose(np.asarray(dev.priority_values),
                               host.priority_values, atol=1e-5)


def test_device_skeleton_structured_cases():
    """jnp Floyd-Warshall extraction (inside jit) vs the host oracle on the
    structured cases: chain, star, disconnected-bridged."""
    _assert_matches_host(_chain_affinity(8))
    K = 6
    star = np.zeros((1, K, K), dtype=np.float32)
    for i in range(K):
        for j in range(K):
            star[0, i, j] = 1e-4 * (i * K + j)
    for k in range(1, K):
        star[0, k, 0] = 1.0
        star[0, 0, k] = 0.5 + 0.01 * k
    _assert_matches_host(star[..., None])
    two = np.zeros((2, K, K), dtype=np.float32)
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in grp:
            for j in grp:
                if i != j:
                    two[0, i, j] = 1.0
                    two[1, i, j] = 0.5
    _assert_matches_host(two[..., None])


@pytest.mark.parametrize("seed", range(10))
def test_device_skeleton_matches_host_random(seed):
    """Randomized differential parity: the device extraction reproduces the
    host (reference-parity-tested) trees exactly, including tie-breaks."""
    g = np.random.default_rng(1000 + seed)
    K = int(g.integers(4, 25))
    n = int(g.integers(1, 4))
    aff = g.uniform(size=(n, K, K, 1)).astype(np.float32)
    _assert_matches_host(aff)


def test_device_skeleton_tie_heavy():
    """Quantized affinities force distance-sum ties so the 1e-5
    perturbation + co-parent paths actually execute on device."""
    for seed in range(5):
        g = np.random.default_rng(50 + seed)
        K = 12
        aff = (g.integers(0, 3, size=(2, K, K, 1)) / 2.0).astype(np.float32)
        aff += g.uniform(0, 1e-3, size=aff.shape).astype(np.float32)
        _assert_matches_host(aff)
