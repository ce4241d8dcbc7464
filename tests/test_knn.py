"""Device kNN (ops/knn.py) vs the sklearn host oracle.

Exact tiled brute force: neighbor SETS must match sklearn away from
distance ties; jittered coordinates make ties measure-zero."""

import numpy as np
import pytest

from ribca_tpu.ops.knn import knn_indices_device
from sklearn.neighbors import NearestNeighbors


def _oracle(coords, k):
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(coords)
    return nbrs.kneighbors(coords)[1][:, 1:]


def _sets_equal(a, b):
    assert a.shape == b.shape
    np.testing.assert_array_equal(np.sort(a, axis=1), np.sort(b, axis=1))


@pytest.mark.parametrize("n,k", [(57, 5), (300, 24), (1000, 9)])
def test_matches_sklearn(n, k, rng):
    coords = rng.uniform(0, 1000, size=(n, 2)) + rng.normal(
        scale=1e-3, size=(n, 2)
    )
    ours = knn_indices_device(coords, k, q_block=128, p_chunk=64)
    _sets_equal(ours, _oracle(coords, k))


def test_blocking_invariance(rng):
    """Same result whatever the tile sizes (incl. single-tile)."""
    coords = rng.uniform(0, 500, size=(200, 2))
    a = knn_indices_device(coords, 7, q_block=64, p_chunk=64)
    b = knn_indices_device(coords, 7, q_block=512, p_chunk=1024)
    _sets_equal(a, b)


def test_k_clamped_and_empty(rng):
    coords = rng.uniform(0, 10, size=(5, 2))
    out = knn_indices_device(coords, 10)  # k > n-1 -> clamped to 4
    assert out.shape == (5, 4)
    one = knn_indices_device(coords[:1], 3)
    assert one.shape == (1, 0)


def test_self_excluded(rng):
    coords = rng.uniform(0, 100, size=(64, 2))
    out = knn_indices_device(coords, 8, q_block=64, p_chunk=64)
    for i in range(64):
        assert i not in out[i]


def test_spatial_uses_device_at_scale(monkeypatch, rng):
    """_knn_indices routes to the device path beyond the threshold."""
    from ribca_tpu.analytics import spatial
    from ribca_tpu.ops import knn as knn_mod

    calls = []
    real = knn_mod.knn_indices_device

    def spy(coords, k, **kw):
        calls.append(len(coords))
        return real(coords, k, q_block=128, p_chunk=256)

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    monkeypatch.setattr(knn_mod, "knn_indices_device", spy)
    coords = rng.uniform(0, 1000, size=(150, 2))
    out = spatial._knn_indices(coords, 6)
    assert calls == [150]
    _sets_equal(out, _oracle(coords, 6))


# -- grid-binned path ---------------------------------------------------------


def test_binned_matches_sklearn_uniform(rng):
    from ribca_tpu.ops.knn import knn_indices_binned

    coords = rng.uniform(0, 2000, size=(3000, 2))
    for k in (5, 24):
        ours = knn_indices_binned(coords, k, q_block=512)
        assert ours is not None
        _sets_equal(ours, _oracle(coords, k))


def test_binned_sparse_regions_patched(rng):
    """Outlier points whose kth neighbor is far away fail the window
    bound and must be patched by the host tree — still exact."""
    from ribca_tpu.ops.knn import knn_indices_binned

    dense = rng.uniform(0, 100, size=(1500, 2))
    outliers = rng.uniform(4000, 5000, size=(8, 2))
    coords = np.concatenate([dense, outliers])
    ours = knn_indices_binned(coords, 10, q_block=256)
    assert ours is not None
    _sets_equal(ours, _oracle(coords, 10))


def test_binned_rejects_clumped(rng):
    """All points in one spot: hot bin defeats the grid -> None."""
    from ribca_tpu.ops.knn import knn_indices_binned

    coords = np.full((2000, 2), 7.0) + rng.normal(scale=1e-9,
                                                  size=(2000, 2))
    assert knn_indices_binned(coords, 10) is None


def test_binned_self_excluded(rng):
    from ribca_tpu.ops.knn import knn_indices_binned

    coords = rng.uniform(0, 300, size=(800, 2))
    out = knn_indices_binned(coords, 6, q_block=256)
    for i in range(len(coords)):
        assert i not in out[i]


# -- fused multiscale features ------------------------------------------------


def _feats_oracle(coords, types, n_types, ks):
    kmax = min(max(ks), len(coords) - 1)
    idx = _oracle(coords, kmax)
    nb = types[idx]
    onehot = np.zeros((len(coords), kmax, n_types), np.float32)
    rows = np.repeat(np.arange(len(coords)), kmax)
    cols = np.tile(np.arange(kmax), len(coords))
    onehot[rows, cols, nb.reshape(-1)] = 1.0
    cum = np.cumsum(onehot, axis=1)
    feats = []
    for k in ks:
        counts = cum[:, min(k, kmax) - 1]
        tot = counts.sum(axis=1, keepdims=True)
        feats.append(np.divide(counts, tot, out=np.zeros_like(counts),
                               where=tot > 0))
    return np.concatenate(feats, axis=1)


def test_fused_features_brute(monkeypatch, rng):
    """Brute-candidate fused features equal the host composition."""
    from ribca_tpu.ops import knn as knn_mod

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    coords = rng.uniform(0, 1000, size=(400, 2))
    types = rng.integers(0, 4, size=400)
    ks = (3, 5, 10)
    ours = knn_mod.multiscale_features_device(coords, types, 4, ks)
    assert ours is not None
    np.testing.assert_allclose(
        ours, _feats_oracle(coords, types, 4, ks), atol=1e-5
    )


def test_fused_features_binned(monkeypatch, rng):
    """Grid-binned fused features equal the host composition (uniform
    layout, sparse stragglers host-patched)."""
    from ribca_tpu.ops import knn as knn_mod

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    monkeypatch.setattr(knn_mod, "BINNED_KNN_MIN", 100)
    coords = rng.uniform(0, 2000, size=(1500, 2))
    types = rng.integers(0, 3, size=1500)
    ks = (5, 10, 24)
    ours = knn_mod.multiscale_features_device(coords, types, 3, ks)
    assert ours is not None
    np.testing.assert_allclose(
        ours, _feats_oracle(coords, types, 3, ks), atol=1e-5
    )


def test_spatial_multiscale_routes_fused(monkeypatch, rng):
    """multiscale_composition takes the fused device path at scale and
    matches its own host path."""
    from ribca_tpu.analytics import spatial
    from ribca_tpu.ops import knn as knn_mod

    calls = []
    real = knn_mod.multiscale_features_device

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    monkeypatch.setattr(knn_mod, "multiscale_features_device", spy)
    mr = rng.uniform(0, 1000, 300)
    mc = rng.uniform(0, 1000, 300)
    types = rng.integers(0, 4, 300)
    fused = spatial.multiscale_composition(mr, mc, types, 4)
    assert calls == [1]
    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 10**9)
    host = spatial.multiscale_composition(mr, mc, types, 4)
    np.testing.assert_allclose(fused, host, atol=1e-5)


def _counts_oracle(coords, types, n_types, k):
    idx = _oracle(coords, k)
    counts = np.zeros((len(coords), n_types), np.float32)
    np.add.at(counts, (np.repeat(np.arange(len(coords)), k),
                       types[idx.reshape(-1)]), 1.0)
    return counts


def test_fused_features_extra_counts_brute(monkeypatch, rng):
    from ribca_tpu.ops import knn as knn_mod

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    coords = rng.uniform(0, 1000, size=(400, 2))
    types = rng.integers(0, 4, size=400)
    ks = (3, 5, 10)
    res = knn_mod.multiscale_features_device(coords, types, 4, ks,
                                             extra_k=7)
    assert res is not None
    feats, counts = res
    np.testing.assert_allclose(
        feats, _feats_oracle(coords, types, 4, ks), atol=1e-5
    )
    np.testing.assert_allclose(
        counts, _counts_oracle(coords, types, 4, 7), atol=1e-5
    )


def test_fused_features_extra_counts_binned(monkeypatch, rng):
    from ribca_tpu.ops import knn as knn_mod

    monkeypatch.setattr(knn_mod, "DEVICE_KNN_MIN", 100)
    monkeypatch.setattr(knn_mod, "BINNED_KNN_MIN", 100)
    coords = rng.uniform(0, 2000, size=(1500, 2))
    types = rng.integers(0, 3, size=1500)
    ks = (5, 10, 24)
    res = knn_mod.multiscale_features_device(coords, types, 3, ks,
                                             extra_k=24)
    assert res is not None
    feats, counts = res
    np.testing.assert_allclose(
        feats, _feats_oracle(coords, types, 3, ks), atol=1e-5
    )
    np.testing.assert_allclose(
        counts, _counts_oracle(coords, types, 3, 24), atol=1e-5
    )
