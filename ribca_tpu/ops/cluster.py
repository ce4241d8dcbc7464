"""PCA projection + k-means clustering on device.

The reference's tissue-region partition runs sklearn PCA(0.99) + KMeans
on host (spatial_methods.py:185-193) — fine to ~10^5 cells, minutes of
single-core time at whole-slide scale. Device counterpart:

* PCA: the feature dim D is small (len(ks)*n_types <= ~150), so the
  (D, D) covariance reduces on device with one (D,N)x(N,D) matmul (MXU)
  and the tiny eigendecomposition runs on host; the projection is one
  more matmul. Component count follows sklearn's n_components=0.99
  semantics (smallest k whose cumulative explained variance >= ratio).
* k-means: deterministic farthest-point ("maxmin") seeding — K
  sequential running-min dispatches — then Lloyd iterations inside one
  jitted ``lax.while_loop``: (N, K) assignment distances, one-hot
  matmul centroid sums, center-shift tolerance. No RNG: runs are
  reproducible across hosts and mesh sizes. Cluster labels are
  arbitrary up to permutation (as are sklearn's across seeds).

The cell axis is sharded over the mesh; centroids/components are
replicated, so XLA inserts psums for every reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.parallel.mesh import cell_sharding, get_mesh, replicated_sharding

# device path pays off beyond this many cells (host sklearn below)
DEVICE_CLUSTER_MIN = 50000

KMEANS_MAX_ITER = 300
KMEANS_TOL = 1e-4


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], dtype=a.dtype)
    out[: len(a)] = a
    return out


@jax.jit
def _cov_stats(x, valid):
    """(sum, weighted second moment) over valid rows: (D,), (D, D)."""
    w = valid.astype(x.dtype)
    xs = x * w[:, None]
    return jnp.sum(xs, axis=0), xs.T @ x


@functools.partial(jax.jit, static_argnames=("k",))
def _project(x, mean, comps, k: int):
    return (x - mean[None, :]) @ comps[:, :k]


def pca_project_device(
    feats: np.ndarray, var_ratio: float, mesh
) -> tuple[object, int]:
    """Center + project onto the top components explaining ``var_ratio``
    of variance (sklearn PCA(n_components=ratio) semantics). Returns the
    (N_pad, k) device projection (cell-sharded) and k."""
    n, d = feats.shape
    n_dev = mesh.size
    # power-of-two row bucket (mesh multiple): the cov/project/k-means
    # programs are keyed on it, so varying slide sizes share programs
    n_pad = max(256, 1 << (max(n, 1) - 1).bit_length())
    n_pad = -(-n_pad // n_dev) * n_dev
    sh = cell_sharding(mesh)
    x = jax.device_put(_pad_rows(feats.astype(np.float32), n_pad), sh)
    valid = jax.device_put(
        (np.arange(n_pad) < n).astype(np.float32), sh
    )
    s, m2 = _cov_stats(x, valid)
    s, m2 = np.asarray(s, np.float64), np.asarray(m2, np.float64)
    mean = s / n
    # weighted E[x x^T] minus mean outer product (pad rows contribute 0)
    cov = (m2 - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    evals, evecs = evals[::-1], evecs[:, ::-1]  # descending
    total = max(float(evals.sum()), 1e-30)
    ratio = np.maximum(evals, 0.0) / total
    k = int(np.searchsorted(np.cumsum(ratio), var_ratio) + 1)
    k = min(max(k, 1), d)
    comps = jax.device_put(
        np.ascontiguousarray(evecs.astype(np.float32)),
        replicated_sharding(mesh),
    )
    mean_dev = jax.device_put(mean.astype(np.float32),
                              replicated_sharding(mesh))
    return _project(x, mean_dev, comps, k), k


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _maxmin_init(x, valid, n_clusters: int):
    """Deterministic farthest-point seeding: first center = valid point
    of maximal norm; then repeatedly the point farthest from its nearest
    chosen center."""
    big = jnp.float32(jnp.inf)
    norms = jnp.where(valid > 0, jnp.sum(x * x, axis=1), -big)
    first = x[jnp.argmax(norms)]

    def step(carry, i):
        centers, mind = carry
        # mind: running distance to nearest chosen center
        idx = jnp.argmax(jnp.where(valid > 0, mind, -big))
        c = x[idx]
        d = jnp.sum((x - c[None, :]) ** 2, axis=1)
        return (centers.at[i].set(c), jnp.minimum(mind, d)), None

    d0 = jnp.sum((x - first[None, :]) ** 2, axis=1)
    init_centers = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(
        first
    )
    (centers, _), _ = jax.lax.scan(
        step, (init_centers, d0), jnp.arange(1, n_clusters)
    )
    return centers


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _lloyd(x, valid, centers0, n_clusters: int):
    """Lloyd iterations to convergence (center shift < KMEANS_TOL) or
    KMEANS_MAX_ITER. Returns (labels, centers)."""
    w = valid.astype(x.dtype)

    def assign(centers):
        d = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * x @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        return jnp.argmin(d, axis=1)

    def body(carry):
        centers, _, i = carry
        labels = assign(centers)
        onehot = (
            jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)
            * w[:, None]
        )
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
            centers,
        )
        shift = jnp.sum((new - centers) ** 2)
        return new, shift, i + 1

    def cond(carry):
        _, shift, i = carry
        return (shift > KMEANS_TOL) & (i < KMEANS_MAX_ITER)

    centers, _, _ = jax.lax.while_loop(
        cond, body, (centers0, jnp.float32(jnp.inf), 0)
    )
    return assign(centers), centers


def kmeans_device(
    proj, n_valid: int, n_clusters: int
) -> np.ndarray:
    """Cluster a device (N_pad, k) projection; returns (n_valid,) labels."""
    n_pad = int(proj.shape[0])
    valid = jnp.arange(n_pad) < n_valid
    centers0 = _maxmin_init(proj, valid, n_clusters)
    labels, _ = _lloyd(proj, valid, centers0, n_clusters)
    return np.asarray(labels)[:n_valid].astype(np.int64)


def pca_kmeans_device(
    feats: np.ndarray,
    n_clusters: int,
    var_ratio: float = 0.99,
    mesh=None,
) -> np.ndarray:
    """PCA(var_ratio) + k-means for one image's composition features —
    the device counterpart of spatial_methods.py:185-193."""
    mesh = mesh if mesh is not None else get_mesh()
    n = len(feats)
    n_clusters = min(n_clusters, max(n, 1))
    proj, _ = pca_project_device(feats, var_ratio, mesh)
    return kmeans_device(proj, n, n_clusters)
