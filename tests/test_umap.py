"""Device UMAP (analytics/umap_tpu) — graph construction against
sklearn, umap invariants, layout quality vs PCA, and embed() routing.

Reference behavior being covered: model.py:655 (5-component UMAP before
HDBSCAN) and model.py:746-765 (2-component cohort visualization).
"""

import numpy as np
import pytest

from ribca_tpu.analytics.embedding import embed
from ribca_tpu.analytics.umap_tpu import (
    _smooth_knn,
    _spectral_init,
    fuzzy_simplicial_set,
    knn_graph_features,
    umap_embed,
)


def _clusters(n_per=200, n_clusters=3, dim=12, seed=0, spread=0.35):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 4.0
    pts = np.concatenate(
        [c + rng.normal(size=(n_per, dim)) * spread for c in centers]
    )
    labels = np.repeat(np.arange(n_clusters), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm].astype(np.float32), labels[perm]


def test_knn_graph_matches_sklearn():
    from sklearn.neighbors import NearestNeighbors

    x, _ = _clusters(n_per=120, dim=8)
    k = 10
    idx, dist = knn_graph_features(x, k)
    ref_d, ref_i = NearestNeighbors(n_neighbors=k + 1).fit(x).kneighbors(x)
    # neighbor SETS must match (ties can reorder within equal distance)
    agree = np.mean(
        [len(np.intersect1d(idx[i], ref_i[i, 1:])) / k
         for i in range(len(x))]
    )
    assert agree > 0.999
    np.testing.assert_allclose(
        np.sort(dist, axis=1), np.sort(ref_d[:, 1:], axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_smooth_knn_hits_target():
    rng = np.random.default_rng(1)
    d = np.sort(rng.uniform(0.1, 2.0, size=(64, 15)).astype(np.float32),
                axis=1)
    rho, sigma = _smooth_knn(d)
    rho, sigma = np.asarray(rho), np.asarray(sigma)
    val = np.sum(
        np.exp(-np.maximum(d - rho[:, None], 0.0) / sigma[:, None]),
        axis=1,
    )
    np.testing.assert_allclose(val, np.log2(15.0), rtol=1e-3)
    assert (rho > 0).all() and (sigma > 0).all()


def test_fuzzy_set_is_symmetric_and_bounded():
    x, _ = _clusters(n_per=100, dim=6, seed=3)
    idx, dist = knn_graph_features(x, 8)
    heads, tails, w = fuzzy_simplicial_set(idx, dist)
    assert (w > 0).all() and (w <= 1.0 + 1e-6).all()
    fwd = {(int(h), int(t)): float(ww) for h, t, ww in zip(heads, tails, w)}
    for (h, t), ww in list(fwd.items())[:500]:
        assert (t, h) in fwd
        assert abs(fwd[(t, h)] - ww) < 1e-5


def _neighbor_purity(emb, labels, k=10):
    from sklearn.neighbors import NearestNeighbors

    nbr = NearestNeighbors(n_neighbors=k + 1).fit(emb)
    idx = nbr.kneighbors(emb)[1][:, 1:]
    return float(np.mean(labels[idx] == labels[:, None]))


def test_layout_preserves_clusters_and_beats_pca():
    from sklearn.manifold import trustworthiness

    x, labels = _clusters(n_per=250, n_clusters=4, dim=16, seed=7)
    emb = umap_embed(x, n_components=2, seed=11, n_epochs=200)
    assert emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    # cluster identity survives the embedding
    assert _neighbor_purity(emb, labels) > 0.95
    # local structure at least as trustworthy as the PCA fallback
    from sklearn.decomposition import PCA

    pca = PCA(n_components=2, random_state=11).fit_transform(x)
    t_umap = trustworthiness(x, emb, n_neighbors=12)
    t_pca = trustworthiness(x, pca, n_neighbors=12)
    assert t_umap >= t_pca - 0.02
    assert t_umap > 0.9


def test_spectral_init_separates_components():
    """Two disjoint cliques: the Fiedler-style coordinate must split
    them — the spectral init sees graph structure PCA cannot."""
    x, labels = _clusters(n_per=150, n_clusters=2, dim=10, seed=21)
    idx, dist = knn_graph_features(x, 10)
    heads, tails, w = fuzzy_simplicial_set(idx, dist)
    emb = _spectral_init(heads, tails, w, len(x), 2, seed=0)
    assert emb is not None and emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    assert np.abs(emb).max() <= 10.1  # umap's +-10 box
    # not the trivial constant eigenvector
    assert emb.std(axis=0).min() > 1e-3
    # some coordinate separates the two clusters almost perfectly
    best = 0.0
    for d in range(2):
        thr = np.median(emb[:, d])
        acc = max(
            np.mean((emb[:, d] > thr) == (labels == 0)),
            np.mean((emb[:, d] > thr) == (labels == 1)),
        )
        best = max(best, acc)
    assert best > 0.95


def test_deterministic_given_seed():
    x, _ = _clusters(n_per=80, dim=6, seed=5)
    e1 = umap_embed(x, seed=42, n_epochs=40)
    e2 = umap_embed(x, seed=42, n_epochs=40)
    np.testing.assert_array_equal(e1, e2)


def test_five_component_discovery_shape():
    x, _ = _clusters(n_per=90, dim=10, seed=9)
    emb = umap_embed(x, n_components=5, seed=1, n_epochs=30)
    assert emb.shape == (len(x), 5)
    assert np.isfinite(emb).all()


def test_subsample_fit_path():
    class Log:
        lines = []

        def log(self, m):
            self.lines.append(m)

    x, labels = _clusters(n_per=300, n_clusters=3, dim=8, seed=13)
    log = Log()
    emb = umap_embed(
        x, n_components=2, seed=3, n_epochs=100, fit_max=600, logger=log
    )
    assert emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    assert any("subsample" in m for m in log.lines)
    # placed points still land among their own cluster
    assert _neighbor_purity(emb, labels, k=10) > 0.9


def test_tiny_input_short_circuits():
    x = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    emb = umap_embed(x, n_components=2, seed=0)
    assert emb.shape == (8, 2)
    assert umap_embed(np.zeros((0, 4), np.float32)).shape == (0, 2)


def test_embed_routes_to_device_umap():
    class Log:
        lines = []

        def log(self, m):
            self.lines.append(m)

    x, _ = _clusters(n_per=60, dim=6, seed=2)
    log = Log()
    out = embed(x, n_components=2, seed=0, logger=log)
    assert out.shape == (len(x), 2)
    assert any("device UMAP" in m for m in log.lines)
