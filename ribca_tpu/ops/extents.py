"""Per-cell mask statistics via on-device segment reductions.

The reference builds ``cell_pos_dict`` {cell_id: ([rows],[cols])} with a
Python double loop over every pixel (preprocess.py:159-211) — its hottest
host path. On TPU the same information reduces to four segment reductions
over the flattened mask: per-cell row/col bounding boxes, pixel counts and
centroid sums. Downstream consumers never need the raw pixel lists:

* patch cropping needs (min+max)//2 per axis (utils.py:227,232);
* CSV export / neighborhood / tissue analysis need mean row/col
  (model.py:785-786, spatial_methods.py:22-23);
* colorize paints via a LUT over the mask (outputs/colorize.py), not lists.

``cell_extents`` returns arrays indexed by raw cell id 0..n_ids; slot 0 is
background. ``present`` marks ids that actually occur (the reference's dict
iterates present ids in ascending order — use ``present_ids``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CellExtents:
    """Host-side view of per-cell mask statistics (index = raw cell id)."""

    rmin: np.ndarray
    rmax: np.ndarray
    cmin: np.ndarray
    cmax: np.ndarray
    count: np.ndarray
    mean_row: np.ndarray
    mean_col: np.ndarray

    @property
    def present(self) -> np.ndarray:
        p = self.count > 0
        p[0] = False
        return p

    @property
    def present_ids(self) -> np.ndarray:
        """Cell ids that occur in the mask, ascending (dict-key order of the
        reference's sorted cell_pos_dict)."""
        return np.nonzero(self.present)[0]


@functools.partial(jax.jit, static_argnames=("n_ids",))
def _extents_device(mask: jnp.ndarray, n_ids: int):
    h, w = mask.shape
    ids = mask.reshape(-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)

    rmin = jax.ops.segment_min(rows, ids, num_segments=n_ids)
    rmax = jax.ops.segment_max(rows, ids, num_segments=n_ids)
    cmin = jax.ops.segment_min(cols, ids, num_segments=n_ids)
    cmax = jax.ops.segment_max(cols, ids, num_segments=n_ids)
    ones = jnp.ones_like(ids)
    count = jax.ops.segment_sum(ones, ids, num_segments=n_ids)
    # keep coordinate sums in int32 (exact); divide on host in f64 so
    # centroids match np.mean over the reference's pixel lists bit-for-bit
    rsum = jax.ops.segment_sum(rows, ids, num_segments=n_ids)
    csum = jax.ops.segment_sum(cols, ids, num_segments=n_ids)
    return rmin, rmax, cmin, cmax, count, rsum, csum


def cell_extents(
    mask: np.ndarray,
    n_ids: int | None = None,
    prefer_native: bool = True,
) -> CellExtents:
    """Compute per-cell extents/centroids/counts for an int mask (H, W).

    Uses the C++ single-pass scanner (ribca_tpu/native) when built — it
    runs on host concurrently with device compute and skips the O(H*W)
    iota arrays — falling back to the device segment-reduction path.
    Both produce identical integers."""
    mask = np.asarray(mask)
    if n_ids is None:
        n_ids = int(mask.max()) + 1

    if prefer_native:
        try:
            from ribca_tpu import native

            rmin, rmax, cmin, cmax, count, rsum, csum = native.mask_scan(
                mask, n_ids
            )
        except (RuntimeError, OSError):
            prefer_native = False
    if not prefer_native:
        out = _extents_device(
            jnp.asarray(mask, dtype=jnp.int32), n_ids=n_ids
        )
        rmin, rmax, cmin, cmax, count, rsum, csum = (
            np.asarray(o) for o in out
        )
    cnt = np.maximum(count, 1).astype(np.float64)
    return CellExtents(
        np.asarray(rmin), np.asarray(rmax), np.asarray(cmin),
        np.asarray(cmax), np.asarray(count),
        np.asarray(rsum, np.float64) / cnt,
        np.asarray(csum, np.float64) / cnt,
    )
