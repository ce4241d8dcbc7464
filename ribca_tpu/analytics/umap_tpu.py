"""Device UMAP: the reference's embedding, computed on the TPU.

The reference calls ``umap.UMAP()`` for novel-type discovery
(model.py:655, 5 components before HDBSCAN) and for the cohort
visualization (model.py:746-765, 2 components). ``umap-learn`` is not
shipped in this environment, and its Numba kernels are single-core
anyway — so this module re-implements the algorithm tpu-first:

* **kNN graph**: exact brute-force in feature space as blocked
  ``-2 X Qᵀ`` matmuls (MXU work) + ``lax.top_k`` merges — the same
  merge scheme as ``ops/knn`` but D-dimensional.
* **Fuzzy simplicial set**: the per-point (rho, sigma) calibration is a
  fixed-count vectorized bisection on device (umap's
  ``smooth_knn_dist``, 64 iterations); symmetrization
  ``W + Wᵀ − W∘Wᵀ`` runs on host scipy.sparse (N·k entries, trivial).
* **Spectral init**: umap's default ``init='spectral'`` (eigenvectors of
  the normalized fuzzy-graph Laplacian) runs as orthogonal iteration on
  device — the SpMV is a ``segment_sum`` over the symmetric edge list,
  QR re-orthonormalizes each step (scipy ``eigsh`` in umap-learn; same
  subspace, iterative solver). PCA init is the degenerate-graph
  fallback.
* **Layout**: umap's per-edge sampling schedule (``epochs_per_sample``)
  is kept exactly, but updates are applied *synchronously* per epoch —
  all active attractive edges and their negative samples compute
  clipped displacement vectors that are ``segment_sum``-accumulated and
  applied once, inside one ``lax.fori_loop`` program. (umap-learn
  applies updates asynchronously Hogwild-style; with the same ±4
  gradient clipping and linearly-decayed learning rate the synchronous
  variant converges to layouts of equivalent trustworthiness — asserted
  in tests/test_umap.py — while vectorizing perfectly.) Negative
  sampling is a fixed ``negative_sample_rate`` draws per active edge
  per epoch rather than umap's fractional schedule — documented
  divergence.

Everything is deterministic given ``seed`` (jax.random, fold_in per
epoch). Defaults mirror ``umap.UMAP()``: n_neighbors=15, min_dist=0.1
(a=1.57694, b=0.89506), 500 epochs below 10k points else 200.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# umap-learn's curve fit for (spread=1.0, min_dist=0.1)
_A_DEFAULT = 1.576943460405378
_B_DEFAULT = 0.8950608781227859

_SMOOTH_ITERS = 64          # bisection steps for sigma (umap uses 64)
_BANDWIDTH_TARGET_SHIFT = 1e-12


# -- kNN in feature space ------------------------------------------------------

_Q_BLOCK = 2048
_P_CHUNK = 8192


@functools.partial(jax.jit, static_argnames=("k", "p_chunk"))
def _knn_feats_block(q, q_ids, pts, sq_pts, n_valid, k: int,
                     p_chunk: int):
    """Exact top-(k+1) neighbors of one query block in D-dim space.

    q: (Q, D) f32; pts: (Np, D) padded; sq_pts: (Np,) |p|^2. Distances
    via |q|^2 - 2 q·p + |p|^2 (the matmul form — MXU work); the small
    cancellation error only reorders near-ties, which UMAP's fuzzy
    weights are insensitive to. Returns (idx (Q, k+1), dist (Q, k+1)),
    self pinned first.
    """
    n_chunks = pts.shape[0] // p_chunk
    chunks = pts.reshape(n_chunks, p_chunk, -1)
    sq_chunks = sq_pts.reshape(n_chunks, p_chunk)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * p_chunk
    sq_q = jnp.sum(q * q, axis=1, keepdims=True)
    qn = q.shape[0]
    kk = k + 1

    init = (
        jnp.full((qn, kk), -jnp.inf, jnp.float32),
        jnp.zeros((qn, kk), jnp.int32),
    )

    def step(carry, chunk):
        vals, idxs = carry
        pts_c, sq_c, base = chunk
        j = base + jnp.arange(p_chunk, dtype=jnp.int32)
        d2 = sq_q - 2.0 * (q @ pts_c.T) + sq_c[None, :]
        score = -jnp.maximum(d2, 0.0)
        score = jnp.where(q_ids[:, None] == j[None, :], jnp.float32(1.0),
                          score)
        score = jnp.where(j[None, :] < n_valid, score, -jnp.inf)
        allv = jnp.concatenate([vals, score], axis=1)
        alli = jnp.concatenate(
            [idxs, jnp.broadcast_to(j[None, :], (qn, p_chunk))], axis=1
        )
        v, sel = jax.lax.top_k(allv, kk)
        i = jnp.take_along_axis(alli, sel, axis=1)
        return (v, i), None

    (vals, idxs), _ = jax.lax.scan(
        step, init, (chunks, sq_chunks, bases)
    )
    dist = jnp.sqrt(jnp.maximum(-vals, 0.0))
    return idxs, dist


def _pad_to(a: np.ndarray, n: int, fill) -> np.ndarray:
    out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


def knn_query_features(
    queries: np.ndarray, points: np.ndarray, k: int,
    exclude_self: bool = False,
):
    """Exact k nearest ``points`` for each query row, D-dimensional.

    With ``exclude_self=True`` queries and points must be the same
    array; row i's own entry is excluded (sklearn's ``[:, 1:]``
    convention). Returns (idx (N, k), dist (N, k)).
    """
    n = len(queries)
    npts = len(points)
    k = min(k, npts - 1 if exclude_self else npts)
    xf = np.ascontiguousarray(points, dtype=np.float32)
    qf = (xf if exclude_self
          else np.ascontiguousarray(queries, dtype=np.float32))
    n_chunks = 1 << (max(-(-npts // _P_CHUNK), 1) - 1).bit_length()
    np_pad = n_chunks * _P_CHUNK
    pts = jax.device_put(_pad_to(xf, np_pad, 0.0))
    sq_pts = jnp.sum(pts * pts, axis=1)
    n_valid = jnp.int32(npts)
    kk = k + 1 if exclude_self else k

    idx_out = np.empty((n, kk), np.int32)
    dist_out = np.empty((n, kk), np.float32)
    pending = []
    for start in range(0, n, _Q_BLOCK):
        stop = min(start + _Q_BLOCK, n)
        m = stop - start
        qb = jax.device_put(_pad_to(qf[start:stop], _Q_BLOCK, 0.0))
        ids = np.full(_Q_BLOCK, -1, np.int32)
        if exclude_self:
            ids[:m] = np.arange(start, stop, dtype=np.int32)
        idx, dist = _knn_feats_block(
            qb, jax.device_put(ids), pts, sq_pts, n_valid, kk - 1,
            _P_CHUNK,
        )
        pending.append((start, m, idx, dist))
        if len(pending) > 4:
            s, mm, i, d = pending.pop(0)
            idx_out[s : s + mm] = np.asarray(i)[:mm]
            dist_out[s : s + mm] = np.asarray(d)[:mm]
    for s, mm, i, d in pending:
        idx_out[s : s + mm] = np.asarray(i)[:mm]
        dist_out[s : s + mm] = np.asarray(d)[:mm]
    if exclude_self:
        # column 0 is the pinned self-match
        return idx_out[:, 1:].astype(np.int64), dist_out[:, 1:]
    return idx_out.astype(np.int64), dist_out


def knn_graph_features(x: np.ndarray, k: int):
    """Exact kNN graph in feature space: (N, D) -> (idx (N, k),
    dist (N, k)), self excluded."""
    return knn_query_features(x, x, k, exclude_self=True)


# -- fuzzy simplicial set ------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _smooth_knn(dist, n_iter: int = _SMOOTH_ITERS):
    """umap's smooth_knn_dist: per-row (rho, sigma) with
    sum_j exp(-max(d_ij - rho, 0)/sigma) = log2(k), by bisection.
    dist: (N, k) sorted ascending."""
    k = dist.shape[1]
    target = jnp.log2(jnp.float32(k))
    nonzero = dist > 0.0
    # rho = distance to nearest nonzero-distance neighbor (umap's
    # local_connectivity=1.0 case)
    rho = jnp.min(jnp.where(nonzero, dist, jnp.inf), axis=1)
    rho = jnp.where(jnp.isfinite(rho), rho, 0.0)

    def psum(sigma):
        d = jnp.maximum(dist - rho[:, None], 0.0)
        return jnp.sum(jnp.exp(-d / sigma[:, None]), axis=1)

    lo = jnp.zeros(dist.shape[0], jnp.float32)
    hi = jnp.full(dist.shape[0], jnp.inf, jnp.float32)
    mid = jnp.ones(dist.shape[0], jnp.float32)

    def body(_, carry):
        lo, hi, mid = carry
        val = psum(mid)
        too_high = val > target + _BANDWIDTH_TARGET_SHIFT
        hi = jnp.where(too_high, mid, hi)
        lo = jnp.where(too_high, lo, mid)
        mid = jnp.where(
            too_high,
            (lo + mid) / 2.0,
            jnp.where(jnp.isinf(hi), mid * 2.0, (mid + hi) / 2.0),
        )
        return lo, hi, mid

    _, _, sigma = jax.lax.fori_loop(0, n_iter, body, (lo, hi, mid))
    # umap clamps tiny sigmas to a fraction of the mean distance
    mean_d = jnp.mean(dist)
    mean_row = jnp.mean(dist, axis=1)
    sigma = jnp.where(
        rho > 0.0,
        jnp.maximum(sigma, 1e-3 * mean_row),
        jnp.maximum(sigma, 1e-3 * mean_d),
    )
    return rho, sigma


def fuzzy_simplicial_set(idx: np.ndarray, dist: np.ndarray):
    """Edge list of the symmetrized fuzzy graph.

    idx/dist: (N, k) neighbor indices/distances (self excluded).
    Returns (heads (E,), tails (E,), weights (E,)) with i<->j listed
    once per direction (like umap's coo output).
    """
    n, k = idx.shape
    rho, sigma = _smooth_knn(jnp.asarray(dist))
    rho = np.asarray(rho)
    sigma = np.asarray(sigma)
    w = np.exp(
        -np.maximum(dist - rho[:, None], 0.0) / sigma[:, None]
    ).astype(np.float64)

    from scipy.sparse import coo_matrix

    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = idx.reshape(-1)
    mat = coo_matrix((w.reshape(-1), (rows, cols)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    t = mat.T.tocsr()
    sym = mat + t - mat.multiply(t)
    sym = sym.tocoo()
    keep = sym.data > 0.0
    return (
        sym.row[keep].astype(np.int32),
        sym.col[keep].astype(np.int32),
        sym.data[keep].astype(np.float32),
    )


# -- layout --------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_epochs", "neg_rate"),
)
def _optimize_layout(
    emb0, heads, tails, eps_per_sample, key, n_epochs: int,
    neg_rate: int, a, b,
):
    """Synchronous UMAP SGD: one fori_loop, all epochs on device.

    emb0: (N, dim) f32 init; heads/tails: (E,) int32;
    eps_per_sample: (E,) f32 (umap's epochs_per_sample). Returns the
    final embedding.
    """
    n = emb0.shape[0]
    e = heads.shape[0]
    clip = 4.0

    def epoch(ep, carry):
        emb, next_sample = carry
        epf = ep.astype(jnp.float32)
        alpha = 1.0 * (1.0 - epf / n_epochs)
        active = next_sample <= epf
        wmask = active.astype(jnp.float32)

        yh = emb[heads]                              # (E, dim)
        yt = emb[tails]
        dvec = yh - yt
        d2 = jnp.sum(dvec * dvec, axis=1)
        # attractive: -2ab d^(2(b-1)) / (1 + a d^(2b))
        pow_b = jnp.power(jnp.maximum(d2, 1e-12), b)
        coef_a = jnp.where(
            d2 > 0.0,
            (-2.0 * a * b * pow_b / jnp.maximum(d2, 1e-12))
            / (a * pow_b + 1.0),
            0.0,
        )
        grad_a = jnp.clip(coef_a[:, None] * dvec, -clip, clip)
        grad_a = grad_a * wmask[:, None]
        # head moves +grad, tail moves -grad (umap move_other=True)
        disp = jax.ops.segment_sum(grad_a, heads, num_segments=n)
        disp = disp + jax.ops.segment_sum(
            -grad_a, tails, num_segments=n
        )

        # negative samples: neg_rate uniform draws per active edge
        kk = jax.random.fold_in(key, ep)
        negs = jax.random.randint(
            kk, (e, neg_rate), 0, n, dtype=jnp.int32
        )
        yn = emb[negs]                               # (E, R, dim)
        dneg = yh[:, None, :] - yn
        dn2 = jnp.sum(dneg * dneg, axis=2)
        pow_bn = jnp.power(jnp.maximum(dn2, 1e-12), b)
        coef_r = (2.0 * b) / (
            (0.001 + dn2) * (a * pow_bn + 1.0)
        )
        same = negs == heads[:, None]
        coef_r = jnp.where(same, 0.0, coef_r)
        grad_r = jnp.clip(coef_r[:, :, None] * dneg, -clip, clip)
        # umap: zero-coef negative still nudges by +4 on the head; we
        # keep the pure-gradient form (documented divergence)
        grad_r = grad_r * wmask[:, None, None]
        disp = disp + jax.ops.segment_sum(
            jnp.sum(grad_r, axis=1), heads, num_segments=n
        )

        emb = emb + alpha * disp
        next_sample = next_sample + jnp.where(active, eps_per_sample,
                                              0.0)
        return emb, next_sample

    emb, _ = jax.lax.fori_loop(
        0, n_epochs, epoch, (emb0, eps_per_sample.copy())
    )
    return emb


@functools.partial(jax.jit, static_argnames=("n", "dim", "n_iter"))
def _spectral_iter(heads, tails, weights, key, n: int, dim: int,
                   n_iter: int = 150):
    """Top-(dim+1) eigenvectors of the normalized fuzzy-graph adjacency
    by orthogonal (subspace) iteration — umap's spectral init, computed
    on device.

    umap-learn calls scipy ``eigsh`` on the normalized Laplacian
    ``L = I - D^-1/2 W D^-1/2`` and takes the smallest-eigenvalue
    eigenvectors (spectral_layout). Those are the LARGEST eigenvectors of
    ``A = D^-1/2 W D^-1/2``; shifting by +I keeps the spectrum positive
    so plain subspace iteration converges to them. The SpMV is a
    ``segment_sum`` over the symmetric edge list (E entries — the graph
    already lives on device from the fuzzy-set step). Column 0 converges
    to the trivial ``d^1/2`` vector and is dropped by the caller.
    """
    deg = jax.ops.segment_sum(weights, heads, num_segments=n)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    wn = weights * dinv[heads] * dinv[tails]

    x0 = jax.random.normal(key, (n, dim + 1), jnp.float32)

    def body(_, x):
        y = jax.ops.segment_sum(wn[:, None] * x[tails], heads,
                                num_segments=n)
        y = y + x  # +I shift: eigenvalues of A+I are in [0, 2]
        q, _ = jnp.linalg.qr(y)
        return q

    q = jax.lax.fori_loop(0, n_iter, body, x0)
    # order columns by Rayleigh quotient of A (descending): column 0 is
    # then the trivial eigenvector, 1..dim the embedding coordinates
    aq = jax.ops.segment_sum(wn[:, None] * q[tails], heads,
                             num_segments=n)
    ray = jnp.sum(q * aq, axis=0)
    order = jnp.argsort(-ray)
    return q[:, order]


def _spectral_init(heads: np.ndarray, tails: np.ndarray,
                   weights: np.ndarray, n: int, dim: int,
                   seed) -> np.ndarray | None:
    """umap-parity spectral initialization; None when degenerate
    (non-finite columns — e.g. an empty graph)."""
    key = jax.random.PRNGKey(0 if seed is None else int(seed) ^ 0x5BEC)
    q = np.asarray(_spectral_iter(
        jnp.asarray(heads), jnp.asarray(tails), jnp.asarray(weights),
        key, n, dim,
    ))
    emb = q[:, 1 : dim + 1]
    if not np.isfinite(emb).all() or emb.shape[1] < dim:
        return None
    # umap scales to the +-10 box and adds tiny noise to break exact ties
    scale = np.abs(emb).max(axis=0)
    if (scale <= 1e-12).any():
        return None
    emb = emb / scale * 10.0
    rng = np.random.default_rng(0 if seed is None else int(seed))
    emb = emb + rng.normal(0.0, 1e-4, emb.shape)
    return np.ascontiguousarray(emb, dtype=np.float32)


def _pca_init(x: np.ndarray, dim: int, seed) -> np.ndarray:
    from sklearn.decomposition import PCA

    d = min(dim, x.shape[0], x.shape[1])
    emb = PCA(n_components=d, random_state=seed).fit_transform(
        np.asarray(x, np.float64)
    )
    if d < dim:
        emb = np.concatenate(
            [emb, np.zeros((len(x), dim - d))], axis=1
        )
    # scale to the +-10 box like umap's spectral init
    emb = emb / max(np.abs(emb).max(), 1e-12) * 10.0
    return np.ascontiguousarray(emb, dtype=np.float32)


# beyond this many points the kNN graph + edge arrays get bounded: fit
# on a seeded subsample, place the rest at the mean embedding of their
# nearest fitted neighbors (umap transform's init heuristic)
UMAP_FIT_MAX = 200_000


def umap_embed(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    seed: int | None = None,
    n_epochs: int | None = None,
    negative_sample_rate: int = 5,
    a: float = _A_DEFAULT,
    b: float = _B_DEFAULT,
    fit_max: int = UMAP_FIT_MAX,
    logger=None,
) -> np.ndarray:
    """(N, D) -> (N, n_components) UMAP embedding, computed on device.

    Parameter defaults mirror ``umap.UMAP()`` (reference model.py:655,
    758). Deterministic given ``seed``.
    """
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    n = len(x)
    if n == 0:
        return np.zeros((0, n_components), np.float32)
    if n <= n_neighbors + 1 or x.shape[1] == 0:
        # tiny inputs: geometry is meaningless; PCA matches shapes
        return _pca_init(x, n_components, seed).astype(np.float64)

    if n > fit_max:
        rng = np.random.default_rng(0 if seed is None else seed)
        fit_rows = np.sort(rng.choice(n, fit_max, replace=False))
        if logger is not None:
            logger.log(
                f"device UMAP: fitting on {fit_max}/{n} seeded "
                "subsample; remaining points placed at their nearest "
                "fitted neighbors' mean embedding"
            )
        emb_fit = umap_embed(
            x[fit_rows], n_components, n_neighbors, seed, n_epochs,
            negative_sample_rate, a, b, fit_max=n, logger=logger,
        )
        out = np.empty((n, n_components), np.float64)
        out[fit_rows] = emb_fit
        rest = np.setdiff1d(np.arange(n), fit_rows)
        if len(rest):
            # device query (not host sklearn): at whole-slide N the
            # placement is millions of queries
            nbr, _ = knn_query_features(
                x[rest], x[fit_rows], min(5, fit_max)
            )
            out[rest] = emb_fit[nbr].mean(axis=1)
        return out

    idx, dist = knn_graph_features(x, n_neighbors)
    heads, tails, weights = fuzzy_simplicial_set(idx, dist)

    # umap's default init: spectral layout of the FULL fuzzy graph
    # (computed on device; PCA only when degenerate)
    emb0 = _spectral_init(heads, tails, weights, n, n_components, seed)
    if emb0 is None:
        emb0 = _pca_init(x, n_components, seed)

    if n_epochs is None:
        n_epochs = 500 if n < 10_000 else 200
    # umap's per-edge schedule: strongest edge every epoch, weight-w
    # edge every max_w/w epochs; edges below 1/n_epochs of max dropped
    max_w = weights.max()
    keep = weights >= max_w / n_epochs
    heads, tails, weights = heads[keep], tails[keep], weights[keep]
    eps = (max_w / weights).astype(np.float32)
    key = jax.random.PRNGKey(0 if seed is None else int(seed))
    emb = _optimize_layout(
        jax.device_put(emb0),
        jax.device_put(heads),
        jax.device_put(tails),
        jax.device_put(eps),
        key,
        int(n_epochs),
        int(negative_sample_rate),
        jnp.float32(a),
        jnp.float32(b),
    )
    return np.asarray(emb, np.float64)
