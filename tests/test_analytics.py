"""Analytics vs brute-force oracles (reference spatial_methods.py)."""

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

from ribca_tpu.analytics.discover import find_extra_cell_types
from ribca_tpu.analytics.spatial import (
    multiscale_composition,
    neighborhood_analysis,
    neighborhood_matrix,
    tissue_region_partition,
)


def random_cells(rng, n, n_types):
    return {
        "cell_ids": np.arange(1, n + 1),
        "mean_row": rng.uniform(0, 500, n),
        "mean_col": rng.uniform(0, 500, n),
        "type_ids": rng.integers(0, n_types, n),
    }


def oracle_neighborhood(mean_row, mean_col, type_ids, n_types, n_neighbors):
    """Per-cell kneighbors loop, exactly spatial_methods.py:36-40."""
    coords = np.array([mean_col, mean_row]).T
    nbrs = NearestNeighbors(
        n_neighbors=n_neighbors, algorithm="ball_tree"
    ).fit(coords)
    mat = np.zeros((n_types, n_types))
    for j in range(len(coords)):
        indices = nbrs.kneighbors([coords[j]], return_distance=False)[0]
        for k in indices[1:]:
            mat[type_ids[j], type_ids[k]] += 1
    return mat


def oracle_composition(mean_row, mean_col, type_ids, n_types,
                       ks=(10, 20, 30, 50, 75, 100, 150, 200)):
    """Triple loop, exactly spatial_methods.py:154-178."""
    coords = np.array([mean_col, mean_row]).T
    kmax = min(max(ks), len(coords) - 1)
    nn = NearestNeighbors(n_neighbors=kmax + 1, algorithm="ball_tree").fit(
        coords
    )
    _, indices = nn.kneighbors(coords)
    indices = indices[:, 1:]
    compositions = []
    for j in range(len(coords)):
        comp = []
        for k in ks:
            temp = np.zeros(n_types)
            idx = indices[j, : min(k, kmax)]
            vals, counts = np.unique(type_ids[idx], return_counts=True)
            for v, c in zip(vals, counts):
                temp[v] = c
            temp /= temp.sum()
            comp.extend(temp)
        compositions.append(comp)
    return np.array(compositions)


@pytest.mark.parametrize("n,k", [(60, 10), (200, 25)])
def test_neighborhood_matrix_matches_oracle(rng, n, k):
    im = random_cells(rng, n, n_types=5)
    got = neighborhood_matrix(
        im["mean_row"], im["mean_col"], im["type_ids"], 5, k
    )
    want = oracle_neighborhood(
        im["mean_row"], im["mean_col"], im["type_ids"], 5, k
    )
    np.testing.assert_array_equal(got, want)


def test_multiscale_composition_matches_oracle(rng):
    im = random_cells(rng, 120, n_types=4)
    got = multiscale_composition(
        im["mean_row"], im["mean_col"], im["type_ids"], 4
    )
    want = oracle_composition(
        im["mean_row"], im["mean_col"], im["type_ids"], 4
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_neighborhood_analysis_writes_files(rng, tmp_path):
    ims = [random_cells(rng, 80, 3) for _ in range(2)]
    cell_types = ["A", "B", "Others"]
    mats = neighborhood_analysis(
        ims, cell_types, n_neighbors=10, integrate=True,
        result_dir=str(tmp_path), batch_id="t",
    )
    assert (tmp_path / "t_integrated_neighborhood.png").exists()
    assert (tmp_path / "t_integrated_neighborhood.csv").exists()
    # integrated matrix rows are normalized
    assert np.all(mats[0].sum(axis=1) <= 1.0 + 1e-9)
    neighborhood_analysis(
        ims, cell_types, n_neighbors=10, integrate=False,
        result_dir=str(tmp_path), batch_id="t",
    )
    assert (tmp_path / "t_neighborhood_1.csv").exists()


def test_tissue_region_partition_labels(rng):
    ims = [random_cells(rng, 150, 4)]
    regions = tissue_region_partition(ims, n_clusters=3, seed=0)
    assert len(regions) == 1
    assert set(regions[0].keys()) == set(range(1, 151))
    assert set(regions[0].values()) <= {0, 1, 2}


@pytest.mark.parametrize("method", ["hdbscan", "spectral"])
def test_tissue_region_partition_bounded_fit(rng, method, monkeypatch,
                                             capsys):
    """Beyond the host fit bound, hdbscan/spectral fit on a subsample and
    1-NN-assign the rest — every cell still gets a label, with a loud
    notice (VERDICT r2 #4)."""
    from ribca_tpu.analytics import spatial

    monkeypatch.setattr(spatial, "HDBSCAN_FIT_MAX", 80)
    monkeypatch.setattr(spatial, "SPECTRAL_FIT_MAX", 80)
    n = 200
    ims = [random_cells(rng, n, 3)]
    regions = tissue_region_partition(
        ims, n_clusters=3, method=method, seed=0
    )
    assert set(regions[0].keys()) == set(range(1, n + 1))
    assert "host fit bound" in capsys.readouterr().err


def test_fit_predict_bounded_matches_unbounded_kmeans(rng):
    """With well-separated blobs the subsampled fit + 1-NN assignment
    recovers the same partition as the full fit."""
    from sklearn.cluster import KMeans

    from ribca_tpu.analytics.spatial import fit_predict_bounded

    a = rng.normal(0, 0.05, size=(120, 4)) + np.r_[5, 0, 0, 0]
    b = rng.normal(0, 0.05, size=(120, 4)) - np.r_[5, 0, 0, 0]
    x = np.concatenate([a, b])
    full = KMeans(n_clusters=2, random_state=0).fit_predict(x)
    sub = fit_predict_bounded(
        KMeans(n_clusters=2, random_state=0), x, fit_max=60, seed=0
    )
    # same partition up to label permutation
    agree = max(
        (full == sub).mean(), (full == (1 - sub)).mean()
    )
    assert agree == 1.0


def test_discovery_bounded_fit(rng, monkeypatch, capsys):
    from ribca_tpu.analytics import spatial

    monkeypatch.setattr(spatial, "HDBSCAN_FIT_MAX", 40)
    n = 120
    ann = [["Others"] * n]
    conf = [np.full(n, -1.0, np.float32)]
    a = rng.normal(0, 0.01, size=(n // 2, 6)) + np.r_[1, 0, 0, 0, 0, 0]
    b = rng.normal(0, 0.01, size=(n // 2, 6)) + np.r_[0, 0, 0, 0, 0, 1]
    inten = [np.concatenate([a, b])]
    find_extra_cell_types(ann, conf, inten, min_cells=10, seed=0)
    extra = {x for x in ann[0] if x.startswith("Additional type")}
    assert len(extra) >= 2
    assert "host fit bound" in capsys.readouterr().err


def test_find_extra_cell_types_small_stays_others(rng):
    ann = [["Others"] * 5]
    conf = [np.full(5, 0.5, np.float32)]
    inten = [rng.uniform(size=(5, 7))]
    find_extra_cell_types(ann, conf, inten, min_cells=3)
    assert ann[0] == ["Others"] * 5
    assert np.all(conf[0] == -1)


def test_find_extra_cell_types_clusters(rng):
    # two clearly separated blobs of Others -> additional types appear
    n = 60
    ann = [["Others"] * n]
    conf = [np.full(n, -1.0, np.float32)]
    a = rng.normal(0, 0.01, size=(n // 2, 6)) + np.r_[1, 0, 0, 0, 0, 0]
    b = rng.normal(0, 0.01, size=(n // 2, 6)) + np.r_[0, 0, 0, 0, 0, 1]
    inten = [np.concatenate([a, b])]
    find_extra_cell_types(ann, conf, inten, min_cells=10, seed=0)
    extra = {x for x in ann[0] if x.startswith("Additional type")}
    assert len(extra) >= 2


def test_find_extra_respects_non_others(rng):
    ann = [["B cell", "Others", "B cell"]]
    conf = [np.asarray([0.9, 0.4, 0.8], np.float32)]
    inten = [rng.uniform(size=(3, 4))]
    find_extra_cell_types(ann, conf, inten, min_cells=2)
    assert ann[0][0] == "B cell" and ann[0][2] == "B cell"
    assert conf[0][0] == pytest.approx(0.9)
    assert conf[0][1] == -1


def test_counts_reproduce_neighborhood_matrix(rng):
    """The extra_k counts from the multiscale pass must rebuild the
    co-occurrence matrix exactly (same kNN answers, zero new queries)."""
    from ribca_tpu.analytics.spatial import neighborhood_matrix_from_counts

    im = random_cells(rng, 200, n_types=5)
    k = 24
    _, counts = multiscale_composition(
        im["mean_row"], im["mean_col"], im["type_ids"], 5, extra_k=k
    )
    got = neighborhood_matrix_from_counts(im["type_ids"], counts, 5)
    want = neighborhood_matrix(
        im["mean_row"], im["mean_col"], im["type_ids"], 5, k + 1
    )
    np.testing.assert_array_equal(got, want)


def test_counts_embed_into_wider_type_space(rng):
    """Counts computed at the image's own n_types embed into the global
    cell-type axis (images rarely contain every type)."""
    from ribca_tpu.analytics.spatial import neighborhood_matrix_from_counts

    im = random_cells(rng, 120, n_types=3)
    _, counts = multiscale_composition(
        im["mean_row"], im["mean_col"], im["type_ids"], 3, extra_k=9
    )
    got = neighborhood_matrix_from_counts(im["type_ids"], counts, 7)
    want = neighborhood_matrix(
        im["mean_row"], im["mean_col"], im["type_ids"], 7, 10
    )
    np.testing.assert_array_equal(got, want)


def test_partition_extra_k_returns_counts(rng):
    ims = [random_cells(rng, 150, 4), random_cells(rng, 90, 4)]
    regions, counts = tissue_region_partition(
        ims, n_clusters=3, seed=0, extra_k=24
    )
    assert len(regions) == 2 and len(counts) == 2
    assert counts[0].shape == (150, 4) and counts[1].shape == (90, 4)
    # every cell has exactly extra_k neighbors counted (n-1 >= 24)
    np.testing.assert_allclose(counts[0].sum(axis=1), 24.0)


def test_neighborhood_analysis_counts_list_matches_direct(rng, tmp_path):
    ims = [random_cells(rng, 80, 3) for _ in range(2)]
    cell_types = ["A", "B", "Others"]
    _, counts = tissue_region_partition(
        ims, n_clusters=2, seed=0, extra_k=9
    )
    direct = neighborhood_analysis(
        ims, cell_types, n_neighbors=10, integrate=True,
        result_dir=str(tmp_path), batch_id="d",
    )
    reused = neighborhood_analysis(
        ims, cell_types, n_neighbors=10, integrate=True,
        result_dir=str(tmp_path), batch_id="r", counts_list=counts,
    )
    np.testing.assert_allclose(direct[0], reused[0], atol=1e-12)
