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

import contextlib
import dataclasses
import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.ops.extents import cell_extents
from ribca_tpu.ops.normalize import (
    cast_f32_masked,
    halo_radius,
    normalize_image_masked,
)
from ribca_tpu.ops.patches import extract_patches
from ribca_tpu.ops.shapes import bucket_dim, pad_image_chw, pad_mask_hw
from ribca_tpu.parallel.mesh import (
    cell_sharding_axis1,
    replicated_sharding,
)

MIN_CHUNK = 64


def trace_stage(tracer, name: str, quiet: bool = False):
    """Sub-stage timing context: the Annotator's Logger when plumbed
    through, a no-op otherwise (library callers without a logger)."""
    if tracer is None:
        return contextlib.nullcontext()
    return tracer.stage(name, quiet=quiet)


@dataclasses.dataclass
class ImageRecord:
    """Everything downstream stages need for one image."""

    cell_ids: np.ndarray          # (N,) present cell ids, ascending
    mean_row: np.ndarray          # (N,) float64 centroid rows
    mean_col: np.ndarray          # (N,) float64 centroid cols
    mask: np.ndarray              # (H, W) int32 instance mask
    intensity_full: np.ndarray    # (N, C) mean intensities in [0, 1]
    panel_probs: dict             # {panel: (N, n_classes) f32}; under
                                  # device voting: {"vote_stats": (N, 3)}
                                  # — [argmax, best vote, min-Others]
                                  # (engine/voting.finish_votes)

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


def dispatch_ladder(cap: int, n_devices: int) -> list[int]:
    """Every dispatch size the pipeline can emit for a chunk cap — the
    bucket set a warm-cache pass must pre-compile (ascending)."""
    sizes = {chunk_size_for(n, cap, n_devices)
             for n in [1] + [1 << k for k in range(27) if (1 << k) <= cap]}
    sizes.add(chunk_size_for(cap, cap, n_devices))
    return sorted(sizes)


@dataclasses.dataclass
class StagedImage:
    """Host-side staging result: canonical pad done, image + mask uploads
    in flight (device_put is async), extents scanned. Produced on the
    batch decode-ahead thread so wire transfer and host pad overlap the
    PREVIOUS image's ensemble compute."""

    img_dev: object               # (C, Hb, Wb) source-dtype, replicated
    mask_dev: object              # (Hb, Wb) int32, replicated
    mask_host: np.ndarray         # true-shape int32
    extents: object               # ops.extents result on the true mask
    true_hw: tuple
    n_channels: int


def stage_image(image, mask, config, mesh):
    """Pad + upload + extents for the single-shot path. Returns the raw
    ``(image, mask)`` pair untouched when the image must take the banded
    pipeline (too big for HBM, or a streaming reader)."""
    budget = getattr(config, "device_image_budget_bytes", 2 << 30)
    if (
        int(np.prod(image.shape)) * 4 > budget
        or hasattr(image, "read_band")
    ):
        return (image, mask)

    if mask.ndim == 3:
        mask = mask[:, :, 0]
    mask = np.ascontiguousarray(mask).astype(np.int32)
    image = np.asarray(image)
    c, h, w = image.shape

    if getattr(config, "canonical_shapes", True):
        # exactness needs pad >= the Gaussian kernel radius
        pad_min = halo_radius(config.blur) if config.normalize else 0
        hb, wb = bucket_dim(h, pad_min), bucket_dim(w, pad_min)
    else:
        hb, wb = h, w

    rep = replicated_sharding(mesh)
    # upload in the source dtype (uint16 slides are half the bytes of f32;
    # host->device bandwidth is the scarce resource); cast happens on
    # device in preprocess_image. The mask carries one extra patch window
    # of zero pad so extract_patches(prepadded=True) never re-pads it
    # inside a chunk dispatch.
    patch = int(40 * config.cell_size / 30.0)
    img_dev = jax.device_put(pad_image_chw(image, hb, wb), rep)
    mask_dev = jax.device_put(
        pad_mask_hw(mask, hb + patch, wb + patch), rep
    )
    extents = cell_extents(
        mask, prefer_native=getattr(config, "use_native_scanner", True)
    )
    # FORCE the transfers to completion here, on the caller's thread.
    # Measured (scripts/diagnose_overlap.py, BASELINE.md r5): a bare
    # async device_put over the tunneled link defers the actual wire
    # transfer until a consumer program needs it, so the batch pipeline's
    # decode-ahead staging produced ZERO wire/compute overlap — warm
    # cohort predict equaled the perfect serial sum, with upload 51% of
    # it — while an explicitly forced put on a worker thread overlaps
    # compute at ~100% efficiency. The Annotator stages on the
    # decode-ahead thread, so this wait rides concurrently with the
    # previous image's ensemble; on non-tunneled hosts transfers are
    # eager and this is a no-op wait. NOTE this forcing is right at
    # per-IMAGE granularity only — the banded per-BAND staging
    # (engine/tiled.py) measured the opposite (async wins, A/B in
    # BASELINE.md r5): blocking at band cadence makes the staging
    # thread wait out the whole enqueued device queue every band.
    img_dev.block_until_ready()
    mask_dev.block_until_ready()
    return StagedImage(img_dev, mask_dev, mask, extents, (h, w), c)


def preprocess_image(
    image,
    mask,
    config,
    mesh,
):
    """Normalize + extents; returns (img_zero, min_val, mask_dev,
    mask_host, extents, (true_h, true_w)) with the image replicated on
    the mesh. ``image`` may be a raw array or an already-StagedImage
    (batch mode stages on the decode-ahead thread).

    The upload is shape-bucketed (ops/shapes.py): H/W round up to a
    canonical ladder with 'symmetric' image pad and zero mask pad, so a
    cohort of similar-sized images compiles ONE set of programs. The true
    extent travels as traced scalars; statistics and the patch gather
    mask the pad, keeping results bitwise equal to the unpadded run for
    blur=0 and ~1e-5 allclose with a blur kernel (ops/shapes.py)."""
    st = (
        image if isinstance(image, StagedImage)
        else stage_image(image, mask, config, mesh)
    )
    if not isinstance(st, StagedImage):
        raise ValueError("image exceeds the single-shot device budget")
    h, w = st.true_hw
    if config.normalize:
        img_dev = normalize_image_masked(
            st.img_dev, h, w,
            blur=float(config.blur), amax=float(config.upper_limit),
        )
    else:
        img_dev = cast_f32_masked(st.img_dev, h, w)

    # _move_image_range (preprocess.py:153-157): per-channel min shift.
    # nan-aware: pad pixels are NaN by the masked-normalization contract.
    min_val = jnp.nanmin(img_dev, axis=(1, 2))
    img_zero = img_dev - min_val[:, None, None]
    # one-window NaN pad applied ONCE, so every chunk dispatch skips the
    # in-program full-image re-pad (extract_patches prepadded=True); the
    # validity mask zeroes any pad pixel a window touches
    img_zero = _pad_img_nan(img_zero,
                            int(40 * config.cell_size / 30.0))

    return img_zero, min_val, st.mask_dev, st.mask_host, st.extents, (h, w)


@functools.partial(jax.jit, static_argnames=("pad",))
def _pad_img_nan(img, pad: int):
    return jnp.pad(img, ((0, 0), (0, pad), (0, pad)),
                   constant_values=jnp.nan)


def pack_size(config, n_devices: int) -> int:
    """Cells per packed ensemble dispatch (multiple of the mesh)."""
    pack = min(getattr(config, "pack_cells", 8192), config.chunk_cells)
    rem = pack % n_devices
    if rem:
        pack += n_devices - rem
    return pack


def effective_prefetch_depth(config, pack: int, n_channels: int) -> int:
    """Dispatch-ahead queue depth: explicit config wins; 0 = auto, sized
    so the in-flight patch buffers stay under ~2 GB of HBM (measured on
    the tunneled chip: deeper queues hide host decode/staging behind
    device compute; unbounded ones risk OOM at wide panels)."""
    d = getattr(config, "prefetch_depth", 0)
    if d and d > 0:
        return d
    piece_bytes = pack * n_channels * 1600 * 4
    return max(2, min(8, (2 << 30) // max(piece_bytes, 1)))


def run_image(
    image: np.ndarray,
    mask: np.ndarray,
    config,
    runner,
    packer=None,
    tracer=None,
) -> ImageRecord:
    """Full single-image flow: returns per-panel probs + intensities.

    ``runner`` is an EnsembleRunner built for the current marker parse.
    Whole slides whose f32 footprint exceeds the config's device budget
    stream through the banded pipeline (engine/tiled.py) instead.

    ``packer`` (engine/packer.CohortPacker) shares partial ensemble
    dispatches across the images of a batch run; when given, the returned
    record's ``panel_probs`` are only complete after ``packer.finalize()``.
    Without one, a local packer is created and finalized before return.
    """
    if isinstance(image, StagedImage):
        n_channels = image.n_channels
    else:
        budget = getattr(config, "device_image_budget_bytes", 2 << 30)
        if (
            int(np.prod(image.shape)) * 4 > budget
            or hasattr(image, "read_band")  # streaming whole-slide reader
        ):
            from ribca_tpu.engine.tiled import run_image_tiled

            return run_image_tiled(image, mask, config, runner,
                                   packer=packer, tracer=tracer)
        n_channels = image.shape[0]

    mesh = runner.mesh
    n_dev = mesh.size
    with trace_stage(tracer, "device.preprocess", quiet=True):
        img_zero, min_val, mask_dev, mask_host, ext, (true_h, true_w) = (
            preprocess_image(image, mask, config, mesh)
        )

    ids = ext.present_ids
    n = len(ids)
    patch_size = int(40 * config.cell_size / 30.0)  # preprocess.py:67,77

    local_packer = packer is None
    if local_packer:
        from ribca_tpu.engine.packer import CohortPacker

        pk = pack_size(config, n_dev)
        packer = CohortPacker(
            runner, pk, n_channels,
            prefetch_depth=effective_prefetch_depth(config, pk,
                                                    n_channels),
        )
    chunk = min(packer.pack,
                chunk_size_for(min(max(n, 1), config.chunk_cells),
                               config.chunk_cells, n_dev))
    sh = cell_sharding_axis1(mesh)
    sink = packer.make_sink(n)

    def pack_args(sel, size):
        """(5, size) stacked [ids, rmin, rmax, cmin, cmax] — one upload
        per chunk (five device_puts over a tunneled link paid five round
        trips)."""
        out = np.zeros((5, size), dtype=np.int32)
        n_sel = len(sel)
        out[0, :n_sel] = sel
        out[1, :n_sel] = ext.rmin[sel]
        out[2, :n_sel] = ext.rmax[sel]
        out[3, :n_sel] = ext.cmin[sel]
        out[4, :n_sel] = ext.cmax[sel]
        return out

    # Dispatch all chunks before materializing any: device runs ahead of
    # host (double-buffered feed, SURVEY §5 "host pipeline overlap").
    # Probs route through the packer; intensities drain here.
    inflight: deque = deque()
    int_parts: list[np.ndarray] = []

    def drain(limit: int):
        while len(inflight) > limit:
            avg, n_valid = inflight.popleft()
            with trace_stage(tracer, "device.drain", quiet=True):
                int_parts.append(np.asarray(avg[:n_valid]))

    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        sel = ids[start:stop]
        n_valid = len(sel)
        # tail chunks drop to their power-of-two bucket instead of padding
        # all the way to `chunk`; the packer then shares the bucket's pad
        # rows with the next image's cells
        size = chunk_size_for(n_valid, chunk, n_dev)
        with trace_stage(tracer, "device.extract", quiet=True):
            cells = jax.device_put(pack_args(sel, size), sh)
            patches, avg_int = extract_patches(
                img_zero, min_val, mask_dev, cells,
                patch_size=patch_size, full_h=true_h, full_w=true_w,
                prepadded=True,
            )
            packer.submit(patches, n_valid, sink, start)
        inflight.append((avg_int, n_valid))
        drain(packer.prefetch_depth)
    drain(0)
    if local_packer:
        with trace_stage(tracer, "device.finalize", quiet=True):
            packer.finalize()

    if int_parts:
        intensity = np.concatenate(int_parts, axis=0)
        intensity = (intensity + 1.0) / 2.0  # preprocess.py:146-149
    else:
        intensity = np.zeros((0, n_channels), np.float32)

    return ImageRecord(
        cell_ids=ids,
        mean_row=ext.mean_row[ids],
        mean_col=ext.mean_col[ids],
        mask=mask_host,
        intensity_full=intensity,
        panel_probs=sink,
    )
