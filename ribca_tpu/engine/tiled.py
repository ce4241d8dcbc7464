"""Tiled (banded) whole-slide pipeline.

Production slides (e.g. 30k x 30k x 20 channels) exceed device HBM as a
single array, and the reference — which holds the full image in host RAM
and loops cells in Python — has no answer beyond swapping. Here the slide
streams through the device in row bands:

* pass A (stats): each band (with a Gaussian-halo of context rows) runs
  background-subtract + blur on device (ops/normalize.band_prenorm) and
  reduces to per-channel histograms/extrema (band_stats); the host merges
  them into the global amax-percentile threshold, scale denominator,
  minimum, and has-signal flags — the reference's global normalization
  statistics (preprocess.py:229-238);
* pass B (extract): each band re-runs the local steps, applies the global
  scalars branchlessly (band_apply_scale), and feeds the band's cells
  through the fused patch-extraction + ensemble programs with band-local
  row addressing (ops/patches.extract_patches row_offset/full_h).

Cells are assigned to the band containing their window's top row, so a
band of rows [s, e) extracts from rows [s, e + patch) — always resident.

Exactness: bit-identical to the single-shot path except the percentile,
which is histogram-approximated (HIST_BINS buckets; error <= max/8192 on
the clip threshold only). Images under the HBM budget use the single-shot
path automatically (engine/pipeline.py), so small inputs stay bit-exact.
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.engine.pipeline import ImageRecord, chunk_size_for
from ribca_tpu.ops.extents import cell_extents
from ribca_tpu.ops.normalize import (
    HIST_BINS,
    band_apply_scale,
    band_prenorm,
    band_stats,
    halo_radius,
    percentile_from_hist,
)
from ribca_tpu.ops.patches import extract_patches
from ribca_tpu.parallel.mesh import cell_sharding, replicated_sharding


def _band_starts(h: int, band_rows: int) -> list[int]:
    return list(range(0, h, band_rows))


def _pad_rows(arr: np.ndarray, rows: int, mode: str = "constant") -> np.ndarray:
    """Pad the row axis (axis -2) to ``rows``. Image bands use
    mode='symmetric': scipy's 'reflect' boundary at the TRUE image bottom
    is (d c b a | a b c d | d c b a) = numpy 'symmetric', so a bottom band
    shorter than the fixed compile shape sees exactly the pixels the
    reference's whole-image Gaussian would. Masks zero-pad (background)."""
    have = arr.shape[-2]
    if have == rows:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[-2] = (0, rows - have)
    return np.pad(arr, pad, mode=mode)


def _channel_hi(image) -> np.ndarray:
    """Per-channel histogram upper range. Integer images use the dtype
    ceiling (streaming readers never materialize, and bg-subtraction only
    lowers values); float ndarrays use the actual max; float streaming
    readers stream it."""
    c = image.shape[0]
    dt = np.dtype(image.dtype)
    if np.issubdtype(dt, np.integer):
        return np.full(c, float(np.iinfo(dt).max), np.float64)
    if isinstance(image, np.ndarray):
        return np.maximum(
            image.reshape(c, -1).max(axis=1).astype(np.float64), 1.0
        )
    # float streaming reader: one cheap max pass
    h = image.shape[1]
    hi = np.full(c, 1.0)
    step = 2048
    for lo in range(0, h, step):
        band = np.asarray(image[:, lo:min(lo + step, h)], np.float64)
        hi = np.maximum(hi, band.max(axis=(1, 2)))
    return hi


def compute_global_norm_stats(image, config, band_rows: int):
    """Pass A: per-channel (thresh, denom, min, has_signal) for the
    banded normalization."""
    c, h, w = image.shape
    halo = halo_radius(config.blur)
    hi = _channel_hi(image)
    hi_dev = jnp.asarray(hi, jnp.float32)
    # dtype-ceiling ranges (integer/streamed inputs) get finer bins so the
    # percentile error stays ~1 intensity unit
    bins = 65536 if np.issubdtype(np.dtype(image.dtype), np.integer) \
        else HIST_BINS

    hists = np.zeros((c, bins), np.int64)
    gmax = np.full(c, -np.inf)
    gmin = np.full(c, np.inf)
    pos = np.zeros(c, np.int64)

    in_rows = band_rows + 2 * halo
    for s in _band_starts(h, band_rows):
        e = min(s + band_rows, h)
        lo = max(s - halo, 0)
        hi_row = min(e + halo, h)
        band = _pad_rows(np.asarray(image[:, lo:hi_row], np.float32), in_rows,
                         mode="symmetric")
        pre = band_prenorm(jnp.asarray(band), blur=float(config.blur))
        interior = pre[:, s - lo : s - lo + (e - s)]
        hist, bmax, bpos = band_stats(interior, hi_dev, bins=bins)
        bmin = jnp.min(interior, axis=(1, 2))
        hists += np.asarray(hist, np.int64)
        gmax = np.maximum(gmax, np.asarray(bmax, np.float64))
        gmin = np.minimum(gmin, np.asarray(bmin, np.float64))
        pos += np.asarray(bpos, np.int64)

    total = h * w
    thresh = np.asarray(
        [
            percentile_from_hist(hists[i], float(hi[i]),
                                 float(config.upper_limit), total)
            for i in range(c)
        ],
        np.float64,
    )
    clipped_max = np.where(thresh > 20.0, np.minimum(gmax, thresh), gmax)
    denom = np.maximum(25.0, clipped_max)
    has_signal = pos > 0
    # global minimum of the scaled image (clip only lowers the top)
    scaled_min = np.where(has_signal, 2.0 * (gmin / denom) - 1.0, -1.0)
    return (
        thresh.astype(np.float32),
        denom.astype(np.float32),
        scaled_min.astype(np.float32),
        has_signal,
    )


def run_image_tiled(
    image: np.ndarray,
    mask: np.ndarray,
    config,
    runner,
    band_rows: int | None = None,
) -> ImageRecord:
    """Banded counterpart of engine.pipeline.run_image; same outputs."""
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    mask = np.ascontiguousarray(mask).astype(np.int32)
    if not hasattr(image, "read_band"):  # streaming readers pass through
        image = np.asarray(image)
    c, h, w = image.shape

    mesh = runner.mesh
    n_dev = mesh.size
    rep = replicated_sharding(mesh)
    sh = cell_sharding(mesh)

    patch_size = int(40 * config.cell_size / 30.0)
    if band_rows is None:
        budget = getattr(config, "device_image_budget_bytes", 1 << 31)
        band_rows = max(int(budget / (c * w * 4 * 4)), 4 * patch_size)
    band_rows = min(band_rows, h)

    if config.normalize:
        thresh, denom, scaled_min, has_signal = compute_global_norm_stats(
            image, config, band_rows
        )
        min_val = jnp.asarray(scaled_min)
        thresh_d = jax.device_put(jnp.asarray(thresh), rep)
        denom_d = jax.device_put(jnp.asarray(denom), rep)
        signal_d = jax.device_put(jnp.asarray(has_signal), rep)
    else:
        if hasattr(image, "channel_min"):
            min_val = jnp.asarray(image.channel_min())
        else:
            min_val = jnp.asarray(
                image.reshape(c, -1).min(axis=1).astype(np.float32)
            )

    ext = cell_extents(
        mask, prefer_native=getattr(config, "use_native_scanner", True)
    )
    ids = ext.present_ids
    n = len(ids)

    # band assignment by the window's top row (utils.py:227-239 clamp)
    offset = (
        patch_size // 2 if patch_size % 2 == 0 else (patch_size + 1) // 2
    )
    x_mean = (ext.rmin[ids] + ext.rmax[ids]) // 2
    xmin = np.maximum(x_mean - offset, 0)
    band_of = np.minimum(xmin // band_rows, (h - 1) // band_rows)

    halo = halo_radius(config.blur) if config.normalize else 0
    ext_rows = band_rows + patch_size            # extraction band height
    in_rows = ext_rows + 2 * halo                # prenorm input height

    chunk = chunk_size_for(
        min(max(n, 1), config.chunk_cells), config.chunk_cells, n_dev
    )

    def pad_cells_arr(a, size, fill=0):
        out = np.full(size, fill, dtype=np.int32)
        out[: len(a)] = a
        return out

    inflight: deque = deque()
    order_parts: list[np.ndarray] = []
    probs_parts: dict[str, list[np.ndarray]] = {
        s.panel: [] for s in runner.specs
    }
    int_parts: list[np.ndarray] = []

    def drain(limit: int):
        while len(inflight) > limit:
            probs, avg, n_valid, idx = inflight.popleft()
            for panel, arr in probs.items():
                probs_parts[panel].append(np.asarray(arr[:n_valid]))
            int_parts.append(np.asarray(avg[:n_valid]))
            order_parts.append(idx)

    for b in sorted(set(band_of.tolist())) if n else []:
        s = b * band_rows
        e = min(s + band_rows, h)
        # extraction rows [s, e + patch), prenorm needs halo around them
        lo = max(s - halo, 0)
        hi_row = min(e + patch_size + halo, h)
        raw = np.asarray(image[:, lo:hi_row], np.float32)
        if config.normalize:
            pre = band_prenorm(
                jax.device_put(
                    jnp.asarray(_pad_rows(raw, in_rows, mode="symmetric")),
                    rep,
                ),
                blur=float(config.blur),
            )
            band_norm = band_apply_scale(pre, thresh_d, denom_d, signal_d)
            start_local = s - lo
            band_img = jax.lax.dynamic_slice_in_dim(
                band_norm, start_local, ext_rows, axis=1
            )
        else:
            band_img = jnp.asarray(
                _pad_rows(raw[:, s - lo :], ext_rows, mode="symmetric")
            )
        band_zero = band_img - min_val[:, None, None]

        mask_band = _pad_rows(mask[s : e + patch_size], ext_rows)
        mask_dev = jax.device_put(mask_band, rep)

        sel_idx = np.nonzero(band_of == b)[0]
        sel = ids[sel_idx]
        for start in range(0, len(sel), chunk):
            stop = min(start + chunk, len(sel))
            piece = sel[start:stop]
            piece_idx = sel_idx[start:stop]
            n_valid = len(piece)
            size = chunk_size_for(max(n_valid, 1), chunk, n_dev)
            args = [
                jax.device_put(pad_cells_arr(a, size), sh)
                for a in (
                    piece, ext.rmin[piece], ext.rmax[piece],
                    ext.cmin[piece], ext.cmax[piece],
                )
            ]
            cell_arr, rmn, rmx, cmn, cmx = args
            patches, avg_int = extract_patches(
                band_zero, min_val, mask_dev, cell_arr, rmn, rmx, cmn, cmx,
                patch_size=patch_size, row_offset=s, full_h=h,
            )
            probs = runner.run_chunk(patches)
            inflight.append((probs, avg_int, n_valid, piece_idx))
            drain(config.prefetch_depth)
    drain(0)

    # reassemble into ascending-cell-id order
    if order_parts:
        order = np.concatenate(order_parts)
        inv = np.argsort(order, kind="stable")
        panel_probs = {
            panel: np.concatenate(parts, axis=0)[inv]
            for panel, parts in probs_parts.items()
        }
        intensity = ((np.concatenate(int_parts, axis=0) + 1.0) / 2.0)[inv]
    else:
        panel_probs = {
            s.panel: np.zeros((0, s.model.num_classes), np.float32)
            for s in runner.specs
        }
        intensity = np.zeros((0, c), np.float32)

    return ImageRecord(
        cell_ids=ids,
        mean_row=ext.mean_row[ids],
        mean_col=ext.mean_col[ids],
        mask=mask,
        intensity_full=intensity,
        panel_probs=panel_probs,
    )
