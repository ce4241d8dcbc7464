"""Exact k-nearest-neighbor indices on device.

The reference's spatial analytics call sklearn ``kneighbors`` per slide
(spatial_methods.py:36-40,163) — a single-core ball tree that takes
minutes at whole-slide scale (10^6 cells x 200 neighbors). Two device
strategies, both exact:

**Tiled brute force** (``knn_indices_device``): queries process in
blocks of ``q_block`` (cell axis sharded over the mesh, points
replicated); each block scans the point set in chunks of ``p_chunk``,
computing the (Q, P) squared distances directly — (dx^2 + dy^2), no
|a|^2-2ab cancellation — and merging into a running top-(k+1) with
``lax.top_k`` over the concatenated (carry | chunk) candidates. The
self-match is forced to sort FIRST (its score is pinned above any real
distance) and dropped, mirroring sklearn's "column 0 is self"
convention; pad rows/points carry a -inf score and never surface.
O(N^2) total work at VPU rates — wins to a few hundred thousand
cell-x-neighbor products, then the host tree's O(N k log N) catches up.

**Grid-binned** (``knn_indices_binned``): cells are spatially local, so
the host bins points into a uniform grid sized for ~k points per bin
and uploads one padded (n_bins, P) index table; each query gathers its
3x3 bin window's candidates ON DEVICE and top-ks them — O(N k) total.
Exactness is VERIFIED per query: if the kth neighbor distance is within
one bin size, every true neighbor provably lies inside the window;
queries that fail the bound (sparse regions) are re-answered by the
host tree. Degenerate layouts (a hot bin holding >8x the expected
count, collinear coordinates) fall back wholesale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.parallel.mesh import cell_sharding, get_mesh, replicated_sharding

# device path pays off beyond this many cells; below it, sklearn's tree
# on host is faster than a dispatch round-trip
DEVICE_KNN_MIN = 20000
# ... and until the O(N^2) top_k merge catches the tree's O(N k log N):
# N*(k+1) above this, the host tree wins (measured crossover on v5e;
# a grid-binned spatial hash would remove the quadratic term — ROADMAP)
DEVICE_KNN_MAX_WORK = 20_000_000

Q_BLOCK = 4096
P_CHUNK = 16384


@functools.partial(
    jax.jit, static_argnames=("k", "p_chunk")
)
def _knn_block(q_xy, q_ids, pts, n_valid, k: int, p_chunk: int):
    """Top-(k+1) neighbor indices for one query block.

    q_xy: (Q, 2) f32 query coords; q_ids: (Q,) their global indices;
    pts: (Np, 2) f32 all points, padded to a multiple of p_chunk with
    n_valid true rows. Returns (Q, k+1) indices, self first.
    """
    q = q_xy.shape[0]
    kk = k + 1
    n_chunks = pts.shape[0] // p_chunk
    chunks = pts.reshape(n_chunks, p_chunk, 2)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * p_chunk

    init = (
        jnp.full((q, kk), -jnp.inf, jnp.float32),
        jnp.zeros((q, kk), jnp.int32),
    )

    def step(carry, chunk):
        vals, idxs = carry
        pts_c, base = chunk
        j = base + jnp.arange(p_chunk, dtype=jnp.int32)
        dx = q_xy[:, 0:1] - pts_c[None, :, 0]
        dy = q_xy[:, 1:2] - pts_c[None, :, 1]
        score = -(dx * dx + dy * dy)          # bigger = closer
        # self sorts first (above any real distance); pads never surface
        score = jnp.where(q_ids[:, None] == j[None, :], jnp.float32(1.0),
                          score)
        score = jnp.where(j[None, :] < n_valid, score, -jnp.inf)
        allv = jnp.concatenate([vals, score], axis=1)
        alli = jnp.concatenate(
            [idxs, jnp.broadcast_to(j[None, :], (q, p_chunk))], axis=1
        )
        v, sel = jax.lax.top_k(allv, kk)
        i = jnp.take_along_axis(alli, sel, axis=1)
        return (v, i), None

    (vals, idxs), _ = jax.lax.scan(step, init, (chunks, bases))
    return idxs


def _pad_to(a: np.ndarray, n: int, fill) -> np.ndarray:
    out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


def knn_indices_device(
    coords: np.ndarray,
    k: int,
    mesh=None,
    q_block: int = Q_BLOCK,
    p_chunk: int = P_CHUNK,
) -> np.ndarray:
    """(N, k) indices of each point's k nearest neighbors, self excluded
    — the device counterpart of sklearn's ``kneighbors()[:, 1:]``."""
    n = len(coords)
    k = min(k, n - 1)
    if k <= 0:
        return np.zeros((n, 0), dtype=np.int64)
    mesh = mesh if mesh is not None else get_mesh()
    n_dev = mesh.size
    q_block = max(q_block - q_block % n_dev, n_dev)

    xy = np.ascontiguousarray(coords, dtype=np.float32)
    # chunk count rounds up to a power of two: the block program is keyed
    # on it, so a cohort of varying slide sizes reuses a handful of
    # programs instead of recompiling per image (<= 2x top_k waste)
    n_chunks = 1 << (max(-(-n // p_chunk), 1) - 1).bit_length()
    np_pad = n_chunks * p_chunk
    pts = jax.device_put(
        _pad_to(xy, np_pad, 0.0), replicated_sharding(mesh)
    )
    n_valid = jnp.int32(n)
    sh = cell_sharding(mesh)

    out = np.empty((n, k + 1), np.int32)
    pending = []
    for start in range(0, n, q_block):
        stop = min(start + q_block, n)
        qn = stop - start
        q_xy = jax.device_put(_pad_to(xy[start:stop], q_block, 0.0), sh)
        # pad queries get id -1: never match a point, results discarded
        ids = np.full(q_block, -1, np.int32)
        ids[:qn] = np.arange(start, stop, dtype=np.int32)
        q_ids = jax.device_put(ids, sh)
        idxs = _knn_block(q_xy, q_ids, pts, n_valid, k, p_chunk)
        pending.append((start, qn, idxs))
        if len(pending) > 2:
            s, m, d = pending.pop(0)
            out[s : s + m] = np.asarray(d)[:m]
    for s, m, d in pending:
        out[s : s + m] = np.asarray(d)[:m]
    # column 0 is the pinned self-match (sklearn convention) — drop it
    return out[:, 1:].astype(np.int64)


# -- grid-binned exact kNN -----------------------------------------------------

BINNED_KNN_MIN = 100_000   # brute force / host tree win below this


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


@functools.partial(jax.jit, static_argnames=("k", "p"))
def _binned_block(q_xy, q_ids, q_bin, table, pts_x, pts_y, nbx, nby,
                  k: int, p: int):
    """Top-(k+1) among the 3x3 bin window's candidates for one query
    block. table: (n_bins_pad + 1, p) int32, -1 = empty, last row all
    empty (out-of-range window cells point there). Point coords come as
    separate 1-D arrays: gathering an (N, 2) array into (Q, 9p, 2) gives
    the trailing dim a (8,128) tile — a 64x HBM blowup (observed OOM).
    Returns (indices (Q, k+1), kth-neighbor squared distance (Q,))."""
    bx, by = q_bin[:, 0], q_bin[:, 1]
    offs = jnp.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                     jnp.int32)
    wx = bx[:, None] + offs[None, :, 0]
    wy = by[:, None] + offs[None, :, 1]
    inside = (wx >= 0) & (wx < nbx) & (wy >= 0) & (wy < nby)
    empty_row = table.shape[0] - 1
    rows = jnp.where(inside, wx * nby + wy, empty_row)
    cand = table[rows].reshape(q_xy.shape[0], 9 * p)      # (Q, 9p)

    safe = jnp.maximum(cand, 0)
    dx = pts_x[safe] - q_xy[:, 0:1]                       # (Q, 9p)
    dy = pts_y[safe] - q_xy[:, 1:2]
    score = -(dx * dx + dy * dy)
    score = jnp.where(cand >= 0, score, -jnp.inf)         # empty slots
    score = jnp.where(cand == q_ids[:, None], jnp.float32(1.0), score)
    v, sel = jax.lax.top_k(score, k + 1)
    idx = jnp.take_along_axis(cand, sel, axis=1)
    # kth real neighbor's squared distance (col 0 is the pinned self);
    # -inf score (ran out of candidates) surfaces as +inf distance
    rk = -v[:, k]
    return idx, rk


def knn_indices_binned(
    coords: np.ndarray,
    k: int,
    mesh=None,
    q_block: int = Q_BLOCK,
    bin_margin: float = 2.0,
) -> np.ndarray | None:
    """Grid-binned exact kNN; returns (N, k) indices, or None when the
    layout defeats the uniform grid (caller falls back)."""
    n = len(coords)
    k = min(k, n - 1)
    if k <= 0:
        return np.zeros((n, 0), dtype=np.int64)
    mesh = mesh if mesh is not None else get_mesh()
    xy = np.ascontiguousarray(coords, dtype=np.float32)

    # robust extents: outliers must not stretch the grid (they clamp to
    # edge bins, fail the exactness bound, and get host-patched)
    lo = np.percentile(xy, 1, axis=0)
    hi = np.percentile(xy, 99, axis=0)
    span = np.maximum(hi - lo, 1e-6)
    area = float(span[0]) * float(span[1])
    if area <= 0 or not np.isfinite(area):
        return None
    # bin sized for ~margin*k points: the 3x3 window then holds ~9*margin*k
    bin_size = float(np.sqrt(bin_margin * k * area / n))
    nbx = max(int(np.ceil(span[0] / bin_size)), 1)
    nby = max(int(np.ceil(span[1] / bin_size)), 1)
    if nbx * nby > 4 * n:  # degenerate: bins would be mostly empty
        return None

    bx = np.clip(((xy[:, 0] - lo[0]) / bin_size).astype(np.int32),
                 0, nbx - 1)
    by = np.clip(((xy[:, 1] - lo[1]) / bin_size).astype(np.int32),
                 0, nby - 1)
    bins = bx.astype(np.int64) * nby + by
    occ = np.bincount(bins, minlength=nbx * nby)
    p = int(occ.max())
    if p > 8 * bin_margin * k + 16:  # hot bin: clumped data, grid loses
        return None
    p = _next_pow2(max(p, 8))

    # padded bin table: row b lists the point indices in bin b
    order = np.argsort(bins, kind="stable")
    slot = np.arange(n) - np.repeat(
        np.concatenate([[0], np.cumsum(occ)[:-1]]), occ
    )
    n_bins_pad = _next_pow2(nbx * nby)
    table = np.full((n_bins_pad + 1, p), -1, np.int32)
    table[bins[order], slot] = order.astype(np.int32)

    rep = replicated_sharding(mesh)
    sh = cell_sharding(mesh)
    n_dev = mesh.size
    q_block = max(q_block - q_block % n_dev, n_dev)
    table_dev = jax.device_put(table, rep)
    n_pad_pts = _next_pow2(max(n, 2))
    pts_x = jax.device_put(
        _pad_to(np.ascontiguousarray(xy[:, 0]), n_pad_pts, 0.0), rep
    )
    pts_y = jax.device_put(
        _pad_to(np.ascontiguousarray(xy[:, 1]), n_pad_pts, 0.0), rep
    )

    out = np.empty((n, k + 1), np.int32)
    rks = np.empty(n, np.float32)
    pending = []
    qbin_all = np.stack([bx, by], axis=1)
    for start in range(0, n, q_block):
        stop = min(start + q_block, n)
        qn = stop - start
        q_xy = jax.device_put(_pad_to(xy[start:stop], q_block, 0.0), sh)
        ids = np.full(q_block, -1, np.int32)
        ids[:qn] = np.arange(start, stop, dtype=np.int32)
        q_ids = jax.device_put(ids, sh)
        q_bin = jax.device_put(
            _pad_to(qbin_all[start:stop], q_block, 0), sh
        )
        idx, rk = _binned_block(
            q_xy, q_ids, q_bin, table_dev, pts_x, pts_y,
            jnp.int32(nbx), jnp.int32(nby), k, p,
        )
        pending.append((start, qn, idx, rk))
        if len(pending) > 2:
            s, m, d, r = pending.pop(0)
            out[s : s + m] = np.asarray(d)[:m]
            rks[s : s + m] = np.asarray(r)[:m]
    for s, m, d, r in pending:
        out[s : s + m] = np.asarray(d)[:m]
        rks[s : s + m] = np.asarray(r)[:m]

    result = out[:, 1:].astype(np.int64)

    # exactness bound: if the kth candidate lies within one bin size,
    # every true neighbor is inside the 3x3 window; sparse-region
    # queries that fail go to the host tree
    failed = np.nonzero(~(rks <= bin_size * bin_size))[0]
    if len(failed):
        if len(failed) > max(n // 20, 1024):  # grid mis-sized for layout
            return None
        from sklearn.neighbors import NearestNeighbors

        nbrs = NearestNeighbors(n_neighbors=k + 1).fit(xy)
        patch = nbrs.kneighbors(xy[failed])[1][:, 1:]
        result[failed] = patch
    return result
