"""Exact k-nearest-neighbor indices on device (tiled brute force).

The reference's spatial analytics call sklearn ``kneighbors`` per slide
(spatial_methods.py:36-40,163) — a single-core ball tree that takes
minutes at whole-slide scale (10^6 cells x 200 neighbors). On TPU the
same exact query is a streaming tiled reduction:

* queries process in blocks of ``q_block`` (cell axis sharded over the
  mesh, points replicated);
* each block scans the point set in chunks of ``p_chunk``, computing the
  (Q, P) squared distances directly — (dx^2 + dy^2), no |a|^2-2ab
  cancellation — and merging into a running top-(k+1) with
  ``lax.top_k`` over the concatenated (carry | chunk) candidates;
* the self-match is forced to sort FIRST (its score is pinned above any
  real distance) and dropped, mirroring sklearn's "column 0 is self"
  convention; pad rows/points carry a -inf score and never surface.

Work is O(N^2) like any exact brute force, but it runs at VPU/MXU rates
instead of one host core: the arithmetic is negligible and the top_k
merge dominates. Results are exact (not approx_max_k) so neighbor SETS
match the host path bit-for-bit away from distance ties.
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
