"""Device PCA + k-means (ops/cluster.py) vs sklearn quality oracles.

Labels are arbitrary up to permutation (true of sklearn across seeds
too), so the tests check subspace/partition QUALITY: PCA component count
and subspace match sklearn; k-means recovers well-separated blobs and
its inertia is within a few percent of sklearn's."""

import numpy as np
import pytest
from sklearn.cluster import KMeans
from sklearn.decomposition import PCA

from ribca_tpu.ops.cluster import (
    kmeans_device,
    pca_kmeans_device,
    pca_project_device,
)
from ribca_tpu.parallel.mesh import get_mesh


def _blobs(rng, n_per, centers, scale=0.5):
    pts, labels = [], []
    for i, c in enumerate(centers):
        pts.append(rng.normal(loc=c, scale=scale, size=(n_per, len(c))))
        labels += [i] * n_per
    x = np.concatenate(pts).astype(np.float32)
    order = rng.permutation(len(x))
    return x[order], np.asarray(labels)[order]


def test_pca_matches_sklearn_subspace(rng):
    x = rng.normal(size=(500, 12)).astype(np.float32)
    # stretch a few directions so the 0.99 cut is nontrivial
    x[:, :3] *= 10.0
    proj, k = pca_project_device(x, 0.99, get_mesh())
    sk = PCA(n_components=0.99).fit(x.astype(np.float64))
    assert k == sk.n_components_
    ours = np.asarray(proj)[: len(x)]
    ref = sk.transform(x.astype(np.float64))
    # same subspace: per-component |cosine| ~ 1 (sign is arbitrary)
    for j in range(k):
        cos = np.dot(ours[:, j], ref[:, j]) / (
            np.linalg.norm(ours[:, j]) * np.linalg.norm(ref[:, j]) + 1e-12
        )
        assert abs(cos) > 0.999, (j, cos)


def _inertia(x, labels):
    tot = 0.0
    for lab in np.unique(labels):
        pts = x[labels == lab]
        tot += ((pts - pts.mean(axis=0)) ** 2).sum()
    return tot


def test_kmeans_recovers_blobs(rng):
    centers = [(0, 0), (12, 0), (0, 12), (12, 12)]
    x, truth = _blobs(rng, 300, centers)
    labels = pca_kmeans_device(x, 4, mesh=get_mesh())
    assert labels.shape == (len(x),)
    # every true blob maps to exactly one predicted cluster
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(truth, labels) > 0.99

    sk = KMeans(n_clusters=4, random_state=0, n_init=10).fit(
        x.astype(np.float64)
    )
    assert _inertia(x, labels) <= 1.05 * _inertia(x, sk.labels_)


def test_kmeans_padding_and_determinism(rng):
    x, _ = _blobs(rng, 101, [(0, 0, 0), (8, 8, 8), (0, 8, 0)])
    a = pca_kmeans_device(x, 3, mesh=get_mesh())
    b = pca_kmeans_device(x, 3, mesh=get_mesh())
    np.testing.assert_array_equal(a, b)  # no RNG anywhere
    assert set(np.unique(a)) <= {0, 1, 2}


def test_more_clusters_than_points(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)
    labels = pca_kmeans_device(x, 8, mesh=get_mesh())
    assert labels.shape == (3,)


def test_partition_routes_to_device(monkeypatch, rng):
    from ribca_tpu.analytics import spatial
    from ribca_tpu.ops import cluster as cluster_mod

    calls = []
    real = cluster_mod.pca_kmeans_device

    def spy(feats, k, **kw):
        calls.append(len(feats))
        return real(feats, k, **kw)

    monkeypatch.setattr(cluster_mod, "DEVICE_CLUSTER_MIN", 50)
    monkeypatch.setattr(cluster_mod, "pca_kmeans_device", spy)
    n = 120
    images = [{
        "cell_ids": np.arange(1, n + 1),
        "mean_row": rng.uniform(0, 100, n),
        "mean_col": rng.uniform(0, 100, n),
        "type_ids": rng.integers(0, 3, n),
    }]
    out = spatial.tissue_region_partition(images, n_clusters=2)
    assert calls == [n]
    assert set(out[0]) == set(range(1, n + 1))
    assert set(out[0].values()) <= {0, 1}
