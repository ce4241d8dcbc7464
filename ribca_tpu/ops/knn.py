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
        if len(pending) > 4:
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


class _BinnedSetup:
    """Host-side grid build + device uploads shared by the index and the
    fused-feature paths."""

    __slots__ = ("n", "k", "xy", "bin_size", "nbx", "nby", "p",
                 "qbin_all", "table_dev", "pts_x", "pts_y", "q_block",
                 "sh")

    def __init__(self, n, k, xy, bin_size, nbx, nby, p, qbin_all,
                 table_dev, pts_x, pts_y, q_block, sh):
        self.n, self.k, self.xy = n, k, xy
        self.bin_size, self.nbx, self.nby, self.p = bin_size, nbx, nby, p
        self.qbin_all = qbin_all
        self.table_dev, self.pts_x, self.pts_y = table_dev, pts_x, pts_y
        self.q_block, self.sh = q_block, sh

    def blocks(self):
        """Yield (start, qn, q_xy, q_ids, q_bin) device blocks."""
        n, q_block, sh, xy = self.n, self.q_block, self.sh, self.xy
        for start in range(0, n, q_block):
            stop = min(start + q_block, n)
            qn = stop - start
            q_xy = jax.device_put(
                _pad_to(xy[start:stop], q_block, 0.0), sh
            )
            ids = np.full(q_block, -1, np.int32)
            ids[:qn] = np.arange(start, stop, dtype=np.int32)
            q_ids = jax.device_put(ids, sh)
            q_bin = jax.device_put(
                _pad_to(self.qbin_all[start:stop], q_block, 0), sh
            )
            yield start, qn, q_xy, q_ids, q_bin


def _binned_setup(coords, k, mesh, bin_margin: float,
                  q_block: int | None = None) -> _BinnedSetup | None:
    """Build the uniform grid; None when the layout defeats it.
    ``q_block`` overrides the auto-sized query block (tests)."""
    n = len(coords)
    xy = np.ascontiguousarray(coords, dtype=np.float32)

    # robust extents: outliers must not stretch the grid (they clamp to
    # edge bins, fail the exactness bound, and get host-patched) — but
    # clamping at the 1-99% percentiles when there ARE no outliers piles
    # ~1% of points per side into the edge bins (measured at 500k
    # uniform: max occupancy 313, all on edges, vs 157 interior), which
    # doubles the padded bin capacity and every query window's cost. So:
    # extend each side to the true extent unless that stretches the
    # span materially (> 5% — genuine outliers).
    lo_p = np.percentile(xy, 1, axis=0)
    hi_p = np.percentile(xy, 99, axis=0)
    span_p = np.maximum(hi_p - lo_p, 1e-6)
    lo_t = xy.min(axis=0)
    hi_t = xy.max(axis=0)
    lo = np.where(lo_p - lo_t <= 0.05 * span_p, lo_t, lo_p)
    hi = np.where(hi_t - hi_p <= 0.05 * span_p, hi_t, hi_p)
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
    # block size adapts to the candidate width: bigger blocks mean fewer
    # host<->device round trips (the dominant cost on a tunneled chip —
    # 49 dispatches at 200k cells cost more wall time than the compute),
    # bounded so the block's (Q, 9p) score/index buffers stay ~<1.5 GB
    if q_block is None:
        q_block = int(
            min(4 * Q_BLOCK, max(Q_BLOCK, (96 << 20) // (9 * p)))
        )
    q_block = max(q_block - q_block % n_dev, n_dev)
    table_dev = jax.device_put(table, rep)
    n_pad_pts = _next_pow2(max(n, 2))
    pts_x = jax.device_put(
        _pad_to(np.ascontiguousarray(xy[:, 0]), n_pad_pts, 0.0), rep
    )
    pts_y = jax.device_put(
        _pad_to(np.ascontiguousarray(xy[:, 1]), n_pad_pts, 0.0), rep
    )
    return _BinnedSetup(n, k, xy, bin_size, nbx, nby, p,
                        np.stack([bx, by], axis=1), table_dev,
                        pts_x, pts_y, q_block, sh)


def _host_patch_indices(xy, k, failed):
    """Exact host-tree answers for the queries that failed the bound."""
    from sklearn.neighbors import NearestNeighbors

    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(xy)
    return nbrs.kneighbors(xy[failed])[1][:, 1:]


# First-attempt bin margin: ~0.6*k points per bin makes the 3x3 window
# ~5.4k candidates — enough that (uniformly distributed) queries pass the
# exactness bound with <1% host-patched stragglers, and the top_k/gather
# width is 4x narrower than the conservative 2.0 (measured on v5e at
# 200k x k=200: 9.8 s vs 35.6 s warm). When the grid mis-sizes for the
# layout (hot bins, >5% bound failures) the caller escalates to 2.0.
BIN_MARGINS = (0.6, 2.0)


def knn_indices_binned(
    coords: np.ndarray,
    k: int,
    mesh=None,
    q_block: int | None = None,
    bin_margin: float | None = None,
) -> np.ndarray | None:
    """Grid-binned exact kNN; returns (N, k) indices, or None when the
    layout defeats the uniform grid (caller falls back). With the
    default ``bin_margin=None`` the margin ladder ``BIN_MARGINS`` is
    tried in order. ``q_block=None`` auto-sizes the query block (up to
    ``4*Q_BLOCK``, memory-bounded); pass an int to pin it."""
    if bin_margin is None:
        for m in BIN_MARGINS:
            out = knn_indices_binned(coords, k, mesh, q_block, m)
            if out is not None:
                return out
        return None
    n = len(coords)
    k = min(k, n - 1)
    if k <= 0:
        return np.zeros((n, 0), dtype=np.int64)
    mesh = mesh if mesh is not None else get_mesh()
    su = _binned_setup(coords, k, mesh, bin_margin, q_block)
    if su is None:
        return None

    out = np.empty((n, k + 1), np.int32)
    rks = np.empty(n, np.float32)
    pending = []
    for start, qn, q_xy, q_ids, q_bin in su.blocks():
        idx, rk = _binned_block(
            q_xy, q_ids, q_bin, su.table_dev, su.pts_x, su.pts_y,
            jnp.int32(su.nbx), jnp.int32(su.nby), k, su.p,
        )
        pending.append((start, qn, idx, rk))
        if len(pending) > 4:
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
    failed = np.nonzero(~(rks <= su.bin_size * su.bin_size))[0]
    if len(failed):
        if len(failed) > max(n // 20, 1024):  # grid mis-sized for layout
            return None
        result[failed] = _host_patch_indices(su.xy, k, failed)
    return result


# -- fused multi-scale composition features ------------------------------------

# The tissue-region partition consumes neighborhood type-composition
# FEATURES, not raw neighbor indices (spatial_methods.py:154-178). Fusing
# the one-hot cumulative composition into the kNN program means each
# query block returns len(ks)*T floats per cell instead of k+1 indices —
# ~5x less wire traffic on a tunneled chip — and the host never builds
# the (N, k, T) one-hot tensor at all.


def _ms_feats_from_idx(idx, types_pad, ks: tuple, n_types: int,
                       extra_k: int = 0):
    """(Q, k) neighbor indices (-1 = none) -> (Q, len(ks), T) raw
    neighbor-type COUNTS, cumulative-one-hot semantics identical to the
    host path (analytics/spatial.multiscale_composition). Counts (not
    the normalized fractions) cross the wire — uint8 when every k fits,
    4x fewer bytes than f32 fractions on a tunneled chip — and the
    caller divides on host (``_feats_from_counts``), which is bitwise
    identical: the division is the same single-rounded f32 op on the
    same integers. ``extra_k`` > 0 additionally returns the counts over
    the extra_k nearest (Q, T) — the per-cell ingredient of the
    neighborhood co-occurrence matrix (spatial_methods.py:36-40), so
    callers that need both never run a second kNN pass."""
    nb = jnp.take(types_pad, jnp.maximum(idx, 0), axis=0)
    valid = (idx >= 0).astype(jnp.float32)
    onehot = jax.nn.one_hot(nb, n_types, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    cum = jnp.cumsum(onehot, axis=1)                    # (Q, k, T)
    ks_idx = jnp.asarray([kk - 1 for kk in ks], jnp.int32)
    counts = jnp.take(cum, ks_idx, axis=1)              # (Q, nks, T)
    extra = (
        cum[:, extra_k - 1] if extra_k > 0
        else jnp.zeros((idx.shape[0], n_types), jnp.float32)
    )
    wire = jnp.uint8 if max(max(ks), extra_k) <= 255 else jnp.int32
    return counts.astype(wire), extra.astype(wire)


def _feats_from_counts(counts: np.ndarray) -> np.ndarray:
    """(Q, nks, T) integer counts -> (Q, nks*T) f32 composition
    fractions; the identical f32 division the device used to run."""
    counts = counts.astype(np.float32)
    tot = counts.sum(axis=-1, keepdims=True)
    feats = np.where(
        tot > 0, counts / np.maximum(tot, np.float32(1e-30)),
        np.float32(0),
    )
    q, nks, t = counts.shape
    return feats.reshape(q, nks * t)


@functools.partial(
    jax.jit, static_argnames=("k", "p", "ks", "n_types", "extra_k")
)
def _binned_feats_block(q_xy, q_ids, q_bin, table, pts_x, pts_y, nbx,
                        nby, types_pad, k: int, p: int, ks: tuple,
                        n_types: int, extra_k: int = 0):
    idx, rk = _binned_block(q_xy, q_ids, q_bin, table, pts_x, pts_y,
                            nbx, nby, k, p)
    feats, extra = _ms_feats_from_idx(idx[:, 1:], types_pad, ks, n_types,
                                      extra_k)
    return feats, extra, rk


@functools.partial(
    jax.jit, static_argnames=("k", "p_chunk", "ks", "n_types", "extra_k")
)
def _brute_feats_block(q_xy, q_ids, pts, n_valid, types_pad, k: int,
                       p_chunk: int, ks: tuple, n_types: int,
                       extra_k: int = 0):
    idx = _knn_block(q_xy, q_ids, pts, n_valid, k, p_chunk)
    return _ms_feats_from_idx(idx[:, 1:], types_pad, ks, n_types, extra_k)


def _host_feats_rows(xy, type_ids, n_types, k, ks, rows, extra_k: int = 0):
    """Host-exact composition features (and extra_k raw counts) for a
    subset of queries (the bound-failed rows of the binned path)."""
    idx = _host_patch_indices(xy, k, rows)
    nb = type_ids[idx]                                   # (m, k)
    onehot = np.zeros((len(rows), k, n_types), np.float32)
    m_rows = np.repeat(np.arange(len(rows)), k)
    m_cols = np.tile(np.arange(k), len(rows))
    onehot[m_rows, m_cols, nb.reshape(-1)] = 1.0
    cum = np.cumsum(onehot, axis=1)
    feats = []
    for kk in ks:
        counts = cum[:, kk - 1]
        tot = counts.sum(axis=1, keepdims=True)
        feats.append(np.divide(counts, tot, out=np.zeros_like(counts),
                               where=tot > 0))
    extra = (
        cum[:, extra_k - 1]
        if extra_k > 0 else np.zeros((len(rows), n_types), np.float32)
    )
    return np.concatenate(feats, axis=1), extra


def multiscale_features_device(
    coords: np.ndarray,
    type_ids: np.ndarray,
    n_types: int,
    ks,
    mesh=None,
    extra_k: int | None = None,
):
    """(N, len(ks)*n_types) multi-scale neighborhood composition features
    computed end-to-end on device; None when no device strategy applies
    (caller falls back to the host path).

    ``extra_k``: also return the raw neighbor-type counts over each
    cell's extra_k nearest neighbors — (feats, counts (N, n_types)) —
    from the SAME kNN pass (capped at kmax like every k). Lets the
    orchestrator derive the neighborhood co-occurrence matrix without a
    second device kNN sweep."""
    n = len(coords)
    kmax = min(max(ks), n - 1)
    if kmax <= 0 or n < DEVICE_KNN_MIN:
        return None
    ks_c = tuple(min(int(kk), kmax) for kk in ks)
    ek = min(int(extra_k), kmax) if extra_k else 0
    mesh = mesh if mesh is not None else get_mesh()
    rep = replicated_sharding(mesh)
    types_pad = jax.device_put(
        _pad_to(np.ascontiguousarray(type_ids, dtype=np.int32),
                _next_pow2(max(n, 2)), 0),
        rep,
    )
    nf = len(ks_c) * n_types
    out = np.empty((n, nf), np.float32)
    extra_out = np.empty((n, n_types), np.float32) if ek else None

    def result(feats):
        return (feats, extra_out) if extra_k else feats

    if n >= BINNED_KNN_MIN:
        for bin_margin in BIN_MARGINS:
            su = _binned_setup(coords, kmax, mesh, bin_margin)
            if su is None:
                continue
            rks = np.empty(n, np.float32)
            pending = []

            def land(item):
                s, m, f, x, r = item
                out[s : s + m] = _feats_from_counts(np.asarray(f)[:m])
                if ek:
                    extra_out[s : s + m] = np.asarray(x)[:m]
                rks[s : s + m] = np.asarray(r)[:m]

            for start, qn, q_xy, q_ids, q_bin in su.blocks():
                feats, extra, rk = _binned_feats_block(
                    q_xy, q_ids, q_bin, su.table_dev, su.pts_x,
                    su.pts_y, jnp.int32(su.nbx), jnp.int32(su.nby),
                    types_pad, kmax, su.p, ks_c, n_types, ek,
                )
                pending.append((start, qn, feats, extra, rk))
                if len(pending) > 4:
                    land(pending.pop(0))
            for item in pending:
                land(item)
            failed = np.nonzero(
                ~(rks <= su.bin_size * su.bin_size)
            )[0]
            if len(failed) <= max(n // 20, 1024):
                if len(failed):
                    pf, px = _host_feats_rows(
                        su.xy, np.asarray(type_ids, np.int64), n_types,
                        kmax, ks_c, failed, ek,
                    )
                    out[failed] = pf
                    if ek:
                        extra_out[failed] = px
                return result(out)
            # grid mis-sized: escalate margin, else brute if affordable

    if n * (kmax + 1) > DEVICE_KNN_MAX_WORK:
        return None

    # brute-force candidates (exact by construction, no patching)
    n_dev = mesh.size
    q_block = max(2 * Q_BLOCK - (2 * Q_BLOCK) % n_dev, n_dev)
    xy = np.ascontiguousarray(coords, dtype=np.float32)
    n_chunks = 1 << (max(-(-n // P_CHUNK), 1) - 1).bit_length()
    pts = jax.device_put(_pad_to(xy, n_chunks * P_CHUNK, 0.0), rep)
    n_valid = jnp.int32(n)
    sh = cell_sharding(mesh)
    pending = []

    def land_brute(item):
        s, m, f, x = item
        out[s : s + m] = _feats_from_counts(np.asarray(f)[:m])
        if ek:
            extra_out[s : s + m] = np.asarray(x)[:m]

    for start in range(0, n, q_block):
        stop = min(start + q_block, n)
        qn = stop - start
        q_xy = jax.device_put(_pad_to(xy[start:stop], q_block, 0.0), sh)
        ids = np.full(q_block, -1, np.int32)
        ids[:qn] = np.arange(start, stop, dtype=np.int32)
        q_ids = jax.device_put(ids, sh)
        feats, extra = _brute_feats_block(
            q_xy, q_ids, pts, n_valid, types_pad, kmax, P_CHUNK, ks_c,
            n_types, ek,
        )
        pending.append((start, qn, feats, extra))
        if len(pending) > 4:
            land_brute(pending.pop(0))
    for item in pending:
        land_brute(item)
    return result(out)
