"""Spatial analytics: neighborhood composition and tissue-region partition.

Capability parity with the reference ``spatial_methods.py`` with the hot
loops vectorized:

* the reference issues one ``kneighbors`` query PER CELL and increments the
  co-occurrence matrix in Python (spatial_methods.py:36-40, with a stray
  ``print()`` per neighbor); here one batched query + ``np.add.at`` scatter
  counts the whole image at once — identical counts, orders of magnitude
  faster on large slides;
* multi-scale neighborhood composition features (k in {10,20,30,50,75,
  100,150,200}, spatial_methods.py:154-178) are built from one 200-NN
  query as a cumulative one-hot sum sliced at each k instead of a Python
  triple loop — identical proportions;
* PCA(0.99) + KMeans / HDBSCAN / SpectralClustering as in
  spatial_methods.py:185-193. The reference constructs
  ``HDBSCAN(n_clusters=...)`` which raises with sklearn's HDBSCAN (SURVEY
  §2 quirks); here "hdbscan" maps to ``HDBSCAN(min_cluster_size=
  n_clusters)`` so the advertised method actually works — divergence by
  necessity, default "kmeans" is unchanged.

Coordinates are (x=mean column, y=mean row) per cell, matching
spatial_methods.py:22-23.
"""

from __future__ import annotations

import os

import numpy as np
from sklearn.cluster import HDBSCAN, KMeans, SpectralClustering
from sklearn.decomposition import PCA
from sklearn.neighbors import NearestNeighbors

MULTISCALE_KS = (10, 20, 30, 50, 75, 100, 150, 200)

# host-sklearn fit bounds for the clusterers that have no device path:
# beyond these, fit on a seeded subsample and label the rest by nearest
# fitted sample (documented, loudly logged). Without the guard a
# whole-slide run silently hands 10^6 x 150 features to single-core
# sklearn — HDBSCAN takes minutes-to-hours and SpectralClustering builds
# an O(N^2) affinity (50k cells ~ 20 GB) before doing any work. Bounds
# calibrated on a 1-core host (scripts/validate_scale_500k.py): HDBSCAN
# 50k x 16-dim 109 s; SpectralClustering 10k x 16-dim 416 s.
HDBSCAN_FIT_MAX = 50_000
SPECTRAL_FIT_MAX = 10_000
# when the fit bound engages, the tissue-partition features are further
# PCA-projected to this many dims: sklearn's density clusterers lose
# their tree acceleration above ~20 dims and go O(N^2 D) (measured:
# 100k-sample ~150-dim HDBSCAN exceeded 45 min on this host)
BOUNDED_FIT_DIMS = 16


def fit_predict_bounded(clusterer, feats, fit_max, seed=None, logger=None,
                        what="clustering"):
    """``clusterer.fit_predict`` with a bounded host fit: beyond
    ``fit_max`` samples, fit on a deterministic subsample and assign
    every remaining point the label of its nearest fitted sample
    (HDBSCAN/Spectral have no ``predict``; 1-NN assignment is their
    standard out-of-sample extension). Noise (-1) propagates."""
    import sys

    n = len(feats)
    if n <= fit_max:
        return clusterer.fit_predict(feats)
    rng = np.random.default_rng(0 if seed is None else seed)
    sub = np.sort(rng.choice(n, size=fit_max, replace=False))
    msg = (
        f"{what}: {n} samples exceed the {fit_max}-sample host fit "
        "bound; fitting on a seeded subsample and assigning the rest "
        "by nearest fitted sample"
    )
    if logger is not None:
        logger.log(msg)
    print(msg, file=sys.stderr)
    sub_labels = np.asarray(clusterer.fit_predict(feats[sub]))
    labels = np.empty(n, dtype=sub_labels.dtype)
    labels[sub] = sub_labels
    mask = np.ones(n, dtype=bool)
    mask[sub] = False
    rest = np.nonzero(mask)[0]
    if len(rest):
        nearest = None
        if len(rest) >= 50_000:
            # whole-slide assignment: the blocked device query
            # (analytics/umap_tpu.knn_query_features — MXU matmuls) beats
            # the single-core ball tree by an order of magnitude here
            try:
                from ribca_tpu.analytics.umap_tpu import (
                    knn_query_features,
                )

                nearest = knn_query_features(
                    np.asarray(feats[rest], np.float32),
                    np.asarray(feats[sub], np.float32), 1,
                )[0][:, 0]
            except Exception:  # no devices / OOM: host fallback
                nearest = None
        if nearest is None:
            nn = NearestNeighbors(n_neighbors=1).fit(feats[sub])
            nearest = nn.kneighbors(feats[rest])[1][:, 0]
        labels[rest] = sub_labels[nearest]
    return labels


def _knn_indices(coords: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k nearest neighbors per cell, self excluded
    (column 0 of the sklearn result, spatial_methods.py:37-38,163).

    Whole-slide scale (>= ops/knn.DEVICE_KNN_MIN cells) runs the exact
    tiled brute-force query on the TPU mesh — the host ball tree is
    single-core and takes minutes at 10^6 cells; small inputs stay on
    the (faster there) sklearn path."""
    k = min(k, len(coords) - 1)
    if k <= 0:
        return np.zeros((len(coords), 0), dtype=np.int64)

    from ribca_tpu.ops.knn import (
        BINNED_KNN_MIN,
        DEVICE_KNN_MAX_WORK,
        DEVICE_KNN_MIN,
        knn_indices_binned,
        knn_indices_device,
    )

    # beyond ~100k cells the O(N k) grid-binned device path wins over
    # both the brute force and the host tree; it verifies its own
    # exactness bound and returns None for layouts that defeat the grid
    if len(coords) >= BINNED_KNN_MIN:
        try:
            binned = knn_indices_binned(coords, k)
            if binned is not None:
                return binned
        except Exception:
            pass

    # brute force is O(N^2) vs the tree's O(N k log N): the device wins
    # until the quadratic term catches up (v5e, warm: 20k x k=200 brute
    # 1.1-1.6 s vs host tree ~5 s; 200k x k=200 brute loses to the tree,
    # which is why the grid-binned O(N k) path above takes over at 100k —
    # binned 200k x k=200 ~10-19 s vs host 73 s, margin ladder 0.6->2.0)
    if (
        DEVICE_KNN_MIN <= len(coords)
        and len(coords) * (k + 1) <= DEVICE_KNN_MAX_WORK
    ):
        try:
            return knn_indices_device(coords, k)
        except Exception:  # no devices / OOM: host fallback
            pass
    nbrs = NearestNeighbors(n_neighbors=k + 1, algorithm="ball_tree").fit(
        coords
    )
    _, indices = nbrs.kneighbors(coords)
    return indices[:, 1:]


def neighborhood_matrix(
    mean_row: np.ndarray,
    mean_col: np.ndarray,
    type_ids: np.ndarray,
    n_types: int,
    n_neighbors: int,
) -> np.ndarray:
    """T x T co-occurrence counts: [i, j] += 1 for every (cell of type i,
    neighbor of type j) pair."""
    coords = np.stack([mean_col, mean_row], axis=1)
    idx = _knn_indices(coords, n_neighbors - 1)  # ref passes n incl. self
    mat = np.zeros((n_types, n_types), dtype=np.float64)
    if idx.size:
        src = np.repeat(type_ids, idx.shape[1])
        dst = type_ids[idx.reshape(-1)]
        np.add.at(mat, (src, dst), 1.0)
    return mat


def _row_normalize(mat: np.ndarray) -> np.ndarray:
    sums = mat.sum(axis=1, keepdims=True)
    return np.divide(mat, sums, out=mat.copy(), where=sums > 0)


def _write_matrix_csv(path: str, mat: np.ndarray, cell_types) -> None:
    """Reference CSV layout (spatial_methods.py:59-70): header row of type
    names, one row per type, trailing commas included."""
    with open(path, "w") as f:
        f.write("cell_type,")
        for name in cell_types:
            f.write(f"{name},")
        f.write("\n")
        for i, name in enumerate(cell_types):
            f.write(f"{name},")
            for j in range(len(cell_types)):
                f.write(f"{mat[i][j]:.3f},")
            f.write("\n")


def _plot_matrix(path: str, mat: np.ndarray, cell_types, title: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    fig = plt.figure()
    ax = fig.add_subplot(111)
    ax.set_title(title)
    sns.heatmap(mat, xticklabels=cell_types, yticklabels=cell_types,
                cmap="vlag", linewidth=0.5)
    plt.xticks(rotation=60)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def neighborhood_analysis(
    images,
    cell_types,
    n_neighbors: int = 10,
    integrate: bool = False,
    normalize: bool = True,
    result_dir: str = ".",
    batch_id: str = "",
    indices=None,
    counts_list=None,
):
    """images: list of dicts with keys mean_row, mean_col, type_ids.

    Writes <batch>_integrated_neighborhood.{png,csv} or per-image
    <batch>_neighborhood_<i>.{png,csv}; returns the matrices.
    ``indices`` overrides the per-image filename numbering (multi-host
    runs keep global manifest indices). ``counts_list`` (one
    (N_i, T_i) per image, from tissue_region_partition's ``extra_k``
    with extra_k == n_neighbors - 1) derives the matrices from the
    already-run feature kNN pass instead of issuing new queries —
    the caller is responsible for the k match."""
    t = len(cell_types)

    def one_matrix(i, im):
        if counts_list is not None:
            return neighborhood_matrix_from_counts(
                im["type_ids"], counts_list[i], t
            )
        return neighborhood_matrix(
            im["mean_row"], im["mean_col"], im["type_ids"], t,
            n_neighbors,
        )

    if integrate:
        mat = np.zeros((t, t), dtype=np.float64)
        for i, im in enumerate(images):
            mat += one_matrix(i, im)
        if normalize:
            mat = _row_normalize(mat)
        _plot_matrix(
            os.path.join(result_dir, f"{batch_id}_integrated_neighborhood.png"),
            mat, cell_types, "Integrated neighborhood analysis",
        )
        _write_matrix_csv(
            os.path.join(result_dir, f"{batch_id}_integrated_neighborhood.csv"),
            mat, cell_types,
        )
        return [mat]

    mats = []
    for i, im in enumerate(images):
        tag = indices[i] if indices is not None else i
        mat = one_matrix(i, im)
        if normalize:
            mat = _row_normalize(mat)
        _plot_matrix(
            os.path.join(result_dir, f"{batch_id}_neighborhood_{tag}.png"),
            mat, cell_types, f"Neighborhood analysis {tag}",
        )
        _write_matrix_csv(
            os.path.join(result_dir, f"{batch_id}_neighborhood_{tag}.csv"),
            mat, cell_types,
        )
        mats.append(mat)
    return mats


def multiscale_composition(
    mean_row: np.ndarray,
    mean_col: np.ndarray,
    type_ids: np.ndarray,
    n_types: int,
    ks=MULTISCALE_KS,
    extra_k: int | None = None,
):
    """(N, len(ks)*n_types) neighborhood type-composition features.

    One 200-NN query; per-k proportions come from a cumulative sum of the
    neighbor one-hots sliced at each k (equals spatial_methods.py:154-178).

    At device scale the whole feature computation is fused into the kNN
    program (ops/knn.multiscale_features_device): each query block
    returns len(ks)*T floats per cell instead of kmax indices, so the
    host never materializes the (N, kmax, T) one-hot and the tunneled
    chip transfers ~5x fewer bytes.

    ``extra_k`` also returns the raw neighbor-type counts over each
    cell's extra_k nearest from the SAME query — (feats, counts
    (N, n_types)) — so the neighborhood co-occurrence matrix costs no
    second kNN pass (see neighborhood_matrix_from_counts)."""
    coords = np.stack([mean_col, mean_row], axis=1)
    kmax = min(max(ks), len(coords) - 1)
    ek = min(int(extra_k), kmax) if extra_k and kmax >= 1 else 0

    from ribca_tpu.ops.knn import DEVICE_KNN_MIN, multiscale_features_device

    if len(coords) >= DEVICE_KNN_MIN and tuple(ks) == MULTISCALE_KS:
        try:
            fused = multiscale_features_device(
                coords, type_ids, n_types, ks,
                extra_k=extra_k,
            )
            if fused is not None:
                return fused
        except Exception:  # no devices / OOM: host fallback
            pass
    idx = _knn_indices(coords, kmax)
    n = len(coords)
    out = np.empty((n, len(ks) * n_types), dtype=np.float32)
    extra_out = np.zeros((n, n_types), np.float32) if extra_k else None
    # blockwise: the (block, kmax, n_types) one-hot cumsum stays ~1 GB
    # instead of materializing (N, 200, T) — 15 GB at 10^6 cells
    block = max(1, (1 << 26) // max(kmax * n_types, 1))
    for s in range(0, n, block):
        e = min(s + block, n)
        m = e - s
        onehot = np.zeros((m, kmax, n_types), dtype=np.float32)
        if idx.size:
            rows = np.repeat(np.arange(m), idx.shape[1])
            cols = np.tile(np.arange(idx.shape[1]), m)
            onehot[rows, cols, type_ids[idx[s:e].reshape(-1)]] = 1.0
        cum = np.cumsum(onehot, axis=1)
        feats = []
        for k in ks:
            kk = min(k, kmax)
            counts = (
                cum[:, kk - 1] if kk >= 1
                else np.zeros((m, n_types), np.float32)
            )
            total = counts.sum(axis=1, keepdims=True)
            feats.append(
                np.divide(counts, total, out=np.zeros_like(counts),
                          where=total > 0)
            )
        out[s:e] = np.concatenate(feats, axis=1)
        if ek:
            extra_out[s:e] = cum[:, ek - 1]
    return (out, extra_out) if extra_k else out


def neighborhood_matrix_from_counts(
    type_ids: np.ndarray,
    counts: np.ndarray,
    n_types: int,
) -> np.ndarray:
    """T x T co-occurrence from per-cell neighbor-type counts (the
    ``extra_k`` output of multiscale_composition): row i sums the counts
    of every cell of type i — identical to neighborhood_matrix over the
    same kNN answers, with zero additional queries."""
    mat = np.zeros((n_types, n_types), dtype=np.float64)
    if len(type_ids) and counts.size:
        tc = counts.shape[1]
        acc = np.zeros((n_types, tc), dtype=np.float64)
        np.add.at(acc, np.asarray(type_ids, np.int64), counts)
        mat[:, :tc] = acc
    return mat


def tissue_region_partition(
    images,
    n_clusters: int = 3,
    n_jobs: int = 0,
    method: str = "kmeans",
    seed: int | None = None,
    logger=None,
    extra_k: int | None = None,
):
    """Per image: multi-scale composition -> PCA(0.99) -> clustering.

    Returns a list of {cell_id: region_label} dicts (one per image);
    with ``extra_k``, returns (that list, per-image neighbor-type counts
    over each cell's extra_k nearest) — the counts ride along the
    feature kNN pass for free, letting the orchestrator reuse them for
    the neighborhood matrices instead of a second kNN sweep.

    An explicit ``seed`` pins the host sklearn path even at device scale:
    the device k-means is deterministic (maxmin seeding) but ignores the
    seed, so honoring a seeded request means running the clusterer the
    seed actually parameterizes."""
    out = []
    counts_all = []
    for im in images:
        type_ids = np.asarray(im["type_ids"], dtype=np.int64)
        n_types = int(type_ids.max()) + 1 if len(type_ids) else 1
        feats = multiscale_composition(
            im["mean_row"], im["mean_col"], type_ids, n_types,
            extra_k=extra_k,
        )
        if extra_k:
            feats, counts = feats
            counts_all.append(counts)

        # whole-slide scale + default method: PCA + k-means on the mesh
        # (ops/cluster.py) — host sklearn is single-core minutes there.
        # Labels differ from sklearn only by the usual seeding
        # arbitrariness; partition quality is equivalent (test_cluster).
        if method == "kmeans" and seed is None:
            from ribca_tpu.ops.cluster import (
                DEVICE_CLUSTER_MIN,
                pca_kmeans_device,
            )

            if len(feats) >= DEVICE_CLUSTER_MIN:
                try:
                    labels = pca_kmeans_device(feats, n_clusters)
                    out.append({
                        int(cid): int(lab)
                        for cid, lab in zip(im["cell_ids"], labels)
                    })
                    continue
                except Exception:  # no devices / OOM: host fallback
                    pass

        jobs = n_jobs if n_jobs and n_jobs > 0 else None
        fit_max = len(feats)
        if method == "kmeans":
            clusterer = KMeans(
                n_clusters=min(n_clusters, max(len(feats), 1)),
                random_state=seed,
            )
        elif method == "hdbscan":
            clusterer = HDBSCAN(min_cluster_size=max(int(n_clusters), 2))
            fit_max = HDBSCAN_FIT_MAX
        elif method == "spectral":
            clusterer = SpectralClustering(
                n_clusters=n_clusters, n_jobs=jobs, random_state=seed
            )
            fit_max = SPECTRAL_FIT_MAX
        else:
            raise ValueError(f"unknown method {method}")
        if len(feats) > 1:
            n_comp: float | int = 0.99
            if len(feats) > fit_max and feats.shape[1] > BOUNDED_FIT_DIMS:
                # whole-slide guard: sklearn's density clusterers fall
                # back to O(N^2 D) brute-force neighbor searches above
                # ~20 dims (KDTree degenerates), which is hours at a
                # 100k-sample fit — cap the projection so the bounded
                # fit stays tree-accelerated (measured on this host:
                # 100k x ~150-dim HDBSCAN >45 min; bounded-dim fits run
                # in minutes)
                n_comp = min(BOUNDED_FIT_DIMS, min(feats.shape))
                msg = (
                    f"tissue_region_partition[{method}]: whole-slide "
                    f"fit uses a {n_comp}-dim PCA projection "
                    "(full 0.99-variance PCA below the fit bound)"
                )
                if logger is not None:
                    logger.log(msg)
            feats = PCA(n_components=n_comp).fit_transform(feats)
        labels = fit_predict_bounded(
            clusterer, feats, fit_max, seed=seed, logger=logger,
            what=f"tissue_region_partition[{method}]",
        )
        out.append({
            int(cid): int(lab)
            for cid, lab in zip(im["cell_ids"], labels)
        })
    return (out, counts_all) if extra_k else out
