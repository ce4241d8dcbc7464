"""Per-image device pipeline: normalize -> extents -> patches -> ensemble.

The reference hands off between preprocessing and prediction via 10k-cell
``.pt`` files on disk (preprocess.py:132-135, model.py:369-391). Here the
hand-off is device memory: patch chunks come out of the fused extraction
kernel (ops/patches.py) already resident on the mesh, flow straight into
the ensemble program (engine/ensemble.py), and only the tiny softmax
matrices and per-cell mean intensities ever return to host. Dispatches are
queued ahead of materialization so host bookkeeping overlaps device
compute (the analog of the reference's ``non_blocking=True`` copies at
model.py:399, without the disk round-trip).

Chunk sizes are bucketed to powers of two (multiples of the mesh) so XLA
compiles a handful of programs that are reused across images and runs.
"""

from __future__ import annotations

import dataclasses
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.ops.extents import cell_extents
from ribca_tpu.ops.normalize import normalize_image
from ribca_tpu.ops.patches import extract_patches
from ribca_tpu.parallel.mesh import cell_sharding, replicated_sharding

MIN_CHUNK = 64


@jax.jit
def _cast_f32(x):
    return x.astype(jnp.float32)


@dataclasses.dataclass
class ImageRecord:
    """Everything downstream stages need for one image."""

    cell_ids: np.ndarray          # (N,) present cell ids, ascending
    mean_row: np.ndarray          # (N,) float64 centroid rows
    mean_col: np.ndarray          # (N,) float64 centroid cols
    mask: np.ndarray              # (H, W) int32 instance mask
    intensity_full: np.ndarray    # (N, C) mean intensities in [0, 1]
    panel_probs: dict             # {panel: (N, n_classes) f32}

    @property
    def n_cells(self) -> int:
        return len(self.cell_ids)


def chunk_size_for(n: int, cap: int, n_devices: int) -> int:
    """Power-of-two bucket >= n (>= MIN_CHUNK), capped, multiple of mesh."""
    size = MIN_CHUNK
    while size < n and size < cap:
        size *= 2
    size = min(size, max(cap, n_devices))
    rem = size % n_devices
    if rem:
        size += n_devices - rem
    return size


def preprocess_image(
    image: np.ndarray,
    mask: np.ndarray,
    config,
    mesh,
):
    """Normalize + extents; returns (img_zero, min_val, mask_dev, extents)
    with the image replicated on the mesh."""
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    mask = np.ascontiguousarray(mask).astype(np.int32)

    rep = replicated_sharding(mesh)
    # upload in the source dtype (uint16 slides are half the bytes of f32;
    # host->device bandwidth is the scarce resource) and cast on device
    img_dev = jax.device_put(np.asarray(image), rep)
    if config.normalize:
        img_dev = normalize_image(
            img_dev, blur=float(config.blur), amax=float(config.upper_limit)
        )
    else:
        img_dev = _cast_f32(img_dev)

    # _move_image_range (preprocess.py:153-157): per-channel min shift.
    min_val = jnp.min(img_dev, axis=(1, 2))
    img_zero = img_dev - min_val[:, None, None]

    mask_dev = jax.device_put(mask, rep)
    extents = cell_extents(
        mask, prefer_native=getattr(config, "use_native_scanner", True)
    )
    return img_zero, min_val, mask_dev, mask, extents


def run_image(
    image: np.ndarray,
    mask: np.ndarray,
    config,
    runner,
) -> ImageRecord:
    """Full single-image flow: returns per-panel probs + intensities.

    ``runner`` is an EnsembleRunner built for the current marker parse.
    Whole slides whose f32 footprint exceeds the config's device budget
    stream through the banded pipeline (engine/tiled.py) instead.
    """
    budget = getattr(config, "device_image_budget_bytes", 2 << 30)
    if (
        int(np.prod(image.shape)) * 4 > budget
        or hasattr(image, "read_band")  # streaming whole-slide reader
    ):
        from ribca_tpu.engine.tiled import run_image_tiled

        return run_image_tiled(image, mask, config, runner)

    mesh = runner.mesh
    n_dev = mesh.size
    img_zero, min_val, mask_dev, mask_host, ext = preprocess_image(
        image, mask, config, mesh
    )

    ids = ext.present_ids
    n = len(ids)
    patch_size = int(40 * config.cell_size / 30.0)  # preprocess.py:67,77

    chunk = chunk_size_for(min(n, config.chunk_cells), config.chunk_cells,
                           n_dev)
    sh = cell_sharding(mesh)

    def pad(a, size, fill=0):
        out = np.full(size, fill, dtype=np.int32)
        out[: len(a)] = a
        return out

    # Dispatch all chunks before materializing any: device runs ahead of
    # host (double-buffered feed, SURVEY §5 "host pipeline overlap").
    inflight: deque = deque()
    probs_parts: dict[str, list[np.ndarray]] = {
        s.panel: [] for s in runner.specs
    }
    int_parts: list[np.ndarray] = []

    def drain(limit: int):
        while len(inflight) > limit:
            probs, avg, n_valid = inflight.popleft()
            for panel, arr in probs.items():
                probs_parts[panel].append(np.asarray(arr[:n_valid]))
            int_parts.append(np.asarray(avg[:n_valid]))

    for start in range(0, max(n, 1), chunk):
        stop = min(start + chunk, n)
        sel = ids[start:stop]
        n_valid = len(sel)
        # tail chunks drop to their power-of-two bucket instead of padding
        # all the way to `chunk` (a 20k-cell image at chunk 8192 would
        # otherwise waste 23% of ensemble compute on the final dispatch)
        size = chunk_size_for(max(n_valid, 1), chunk, n_dev)
        args = [
            jax.device_put(pad(a, size), sh)
            for a in (
                sel, ext.rmin[sel], ext.rmax[sel], ext.cmin[sel],
                ext.cmax[sel],
            )
        ]
        cell_arr, rmin, rmax, cmin, cmax = args
        patches, avg_int = extract_patches(
            img_zero, min_val, mask_dev, cell_arr, rmin, rmax, cmin, cmax,
            patch_size=patch_size,
        )
        probs = runner.run_chunk(patches)
        inflight.append((probs, avg_int, n_valid))
        drain(config.prefetch_depth)
    drain(0)

    panel_probs = {
        panel: (
            np.concatenate(parts, axis=0)
            if parts else np.zeros(
                (0, next(s for s in runner.specs
                         if s.panel == panel).model.num_classes),
                np.float32,
            )
        )
        for panel, parts in probs_parts.items()
    }
    if int_parts:
        intensity = np.concatenate(int_parts, axis=0)
        intensity = (intensity + 1.0) / 2.0  # preprocess.py:146-149
    else:
        intensity = np.zeros((0, image.shape[0]), np.float32)

    return ImageRecord(
        cell_ids=ids,
        mean_row=ext.mean_row[ids],
        mean_col=ext.mean_col[ids],
        mask=mask_host,
        intensity_full=intensity,
        panel_probs=panel_probs,
    )
