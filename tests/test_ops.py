"""Property tests for the ops layer vs brute-force NumPy references."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from gym_flock_tpu.ops import (
    knn_edges,
    mean_pool_normalize,
    nodes_within_radius,
    pairwise_sq_dists,
    pos_diff,
    radius_adjacency,
    radius_edges_masked,
)


def test_pos_diff_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(13, 4)
    b = rng.randn(7, 4)
    got = np.asarray(pos_diff(jnp.asarray(a), jnp.asarray(b)))
    want = a.reshape(13, 1, 4) - b.reshape(1, 7, 4)
    np.testing.assert_allclose(got, want)


def test_pairwise_sq_dists_diagonal_fill():
    rng = np.random.RandomState(1)
    x = rng.randn(9, 2)
    r2 = np.asarray(pairwise_sq_dists(pos_diff(jnp.asarray(x)), fill_diagonal=np.inf))
    assert np.all(np.isinf(np.diag(r2)))
    i, j = 2, 5
    np.testing.assert_allclose(r2[i, j], np.sum((x[i] - x[j]) ** 2))


def test_mean_pool_normalize_zero_rows():
    adj = jnp.asarray([[0.0, 1.0], [0.0, 0.0]])
    out = np.asarray(mean_pool_normalize(adj))
    np.testing.assert_allclose(out, [[0.0, 1.0], [0.0, 0.0]])


def test_radius_edges_masked_vs_bruteforce():
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 10, size=(40, 2))
    rad = 2.5
    mask, dist, diff, r = radius_edges_masked(rad, jnp.asarray(pts))
    mask = np.asarray(mask)
    # brute force: 0 < dist <= rad
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)
    want = (d <= rad) & (d > 0)
    np.testing.assert_array_equal(mask, want)
    np.testing.assert_allclose(np.asarray(dist)[mask], d[want])


def test_knn_edges_drop_nearest_matches_reference_rule():
    rng = np.random.RandomState(3)
    p1 = rng.uniform(0, 10, size=(15, 2))
    p2 = rng.uniform(0, 10, size=(30, 2))
    k = 4
    idx, dists, diffs = knn_edges(k, jnp.asarray(p1), jnp.asarray(p2), allow_nearest=False)
    idx = np.asarray(idx)
    d = np.linalg.norm(p1[:, None, :] - p2[None, :, :], axis=2)
    for i in range(15):
        order = np.argsort(d[i])
        want = set(order[1 : k + 1])  # drop the single nearest
        assert set(idx[i]) == want, f"row {i}"
        np.testing.assert_allclose(np.sort(np.asarray(dists)[i]), np.sort(d[i, list(want)]))


def test_knn_edges_allow_nearest():
    rng = np.random.RandomState(4)
    p1 = rng.uniform(0, 10, size=(12, 2))
    p2 = rng.uniform(0, 10, size=(25, 2))
    k = 3
    idx, _, _ = knn_edges(k, jnp.asarray(p1), jnp.asarray(p2), allow_nearest=True)
    idx = np.asarray(idx)
    d = np.linalg.norm(p1[:, None, :] - p2[None, :, :], axis=2)
    for i in range(12):
        assert set(idx[i]) == set(np.argsort(d[i])[:k])


def test_nodes_within_radius_matches_reference_quirk():
    # the reference marks a node 'seen' only if sum of (distances <= rad) > 0,
    # so an exactly-coincident node alone does not mark itself (utils.py:27-39)
    p1 = jnp.asarray([[0.0, 0.0]])
    p2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0]])
    got = np.asarray(nodes_within_radius(2.0, p1, p2))
    np.testing.assert_array_equal(got, [False, True, False])
