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
* pass B (extract): each band's cells flow through the fused
  patch-extraction + ensemble programs with band-local row addressing
  (ops/patches.extract_patches row_offset/full_h); the global scalars
  apply per WINDOW inside the extraction kernel (fused with the gather),
  never as a separate full-band pass.

Cells are assigned to the band containing their window's top row, so a
band of rows [s, e) extracts from rows [s, e + patch) — always resident.

Single-upload cache mode: when the slide's f32 prenorm fits
``config.device_prenorm_cache_bytes`` of HBM, pass A writes every
prenormed band into ONE contiguous pre-padded HBM array and computes the
global statistics with the exact jnp.percentile math
(ops/normalize.stats_from_pre_channel) over the cached pixels; pass B is
then a single packed chunk loop gathering windows straight off the cache
(no band assembly, no full-band scale passes, no per-chunk re-pads).
Each band is decoded once, uploaded once (in the SOURCE dtype — half the
tunnel bytes of f32), and prenormed once, and the result is bit-identical
to the single-shot path. Band decode runs one band ahead on a host
thread, so IO hides behind upload/compute within a single slide.

Slides beyond the cache budget fall back to the two-pass flow, where the
percentile is histogram-approximated (HIST_BINS buckets; error <=
max/8192 on the clip threshold only). Images under the HBM budget use the
single-shot path automatically (engine/pipeline.py).
"""

from __future__ import annotations

import functools
import os
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.engine.pipeline import (
    ImageRecord,
    chunk_size_for,
    trace_stage,
)
from ribca_tpu.ops.extents import cell_extents
from ribca_tpu.ops.normalize import (
    HIST_BINS,
    band_prenorm,
    band_stats,
    halo_radius,
    percentile_from_hist,
    stats_from_pre_channel,
)
from ribca_tpu.ops.patches import extract_patches
from ribca_tpu.parallel.mesh import cell_sharding_axis1, replicated_sharding


def _band_starts(h: int, band_rows: int) -> list[int]:
    return list(range(0, h, band_rows))


# auto-budget headroom: fraction of the device's FREE memory the prenorm
# cache may claim. The remainder covers in-flight patch buffers (~1.8 GB
# at the auto prefetch depth), ensemble params, and XLA scratch.
PRENORM_CACHE_FREE_FRACTION = 0.6
# fraction of TOTAL HBM used when only the device kind is known (no
# live memory_stats — e.g. remote/tunneled TPU backends return None):
# conservative because in-use bytes are invisible.
PRENORM_CACHE_TOTAL_FRACTION = 0.45
_FALLBACK_CACHE_BYTES = 4 << 30
# per-chip HBM by device_kind substring (jax Device.device_kind)
_HBM_BY_KIND = (
    ("v5 lite", 16 << 30), ("v5litepod", 16 << 30),
    ("v5e", 16 << 30), ("v5p", 95 << 30),
    ("v6 lite", 32 << 30), ("v6e", 32 << 30),
    ("v4", 32 << 30), ("v3", 32 << 30), ("v2", 16 << 30),
)


def prenorm_cache_budget(config, mesh) -> int:
    """Resolve ``config.device_prenorm_cache_bytes``: explicit values
    (>= 0) pass through; -1 auto-sizes from the device's measured free
    memory, or from the device kind's known HBM when the backend reports
    no stats (tunneled TPUs return None). Backends with neither (CPU
    test meshes) fall back to the historical 4 GB constant."""
    b = getattr(config, "device_prenorm_cache_bytes", -1)
    if b is not None and b >= 0:
        return int(b)
    try:
        dev = next(iter(mesh.devices.flat))
    except Exception:
        return _FALLBACK_CACHE_BYTES
    try:
        stats = dev.memory_stats() or {}
        free = int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
        if free > 0:
            return int(free * PRENORM_CACHE_FREE_FRACTION)
    except Exception:
        pass
    if getattr(dev, "platform", "") == "tpu":
        kind = getattr(dev, "device_kind", "").lower()
        for sub, hbm in _HBM_BY_KIND:
            if sub in kind:
                return int(hbm * PRENORM_CACHE_TOTAL_FRACTION)
    return _FALLBACK_CACHE_BYTES


def _prefetch_spans(image, spans, stage=None):
    """Yield ``image[:, lo:hi]`` for each (lo, hi) span, decoding one span
    ahead on a host thread so IO overlaps device work (SURVEY §5 "host
    pipeline overlap" — the reference reads whole pages synchronously).

    ``stage`` (optional) runs on the SAME worker thread over each decoded
    span — band callers pad+``device_put`` there so the upload is issued
    off the consuming thread. The puts stay ASYNC by default: a 500k
    whole-slide A/B (BASELINE.md r5) measured async staging at
    prenorm.bands 11.6-29.9 s vs 58.7 s when each band blocked on
    ``block_until_ready`` — over the tunneled link the h2d completion
    event appears to order behind already-enqueued device programs, so
    blocking per band serializes wire with compute exactly where the
    in-flight band pipeline should hide it. ``RIBCA_STAGE_FORCE=1``
    restores the forced wait for A/B timing."""
    from concurrent.futures import ThreadPoolExecutor

    def decode(span):
        lo, hi = span
        cur = np.asarray(image[:, lo:hi])
        return stage(cur) if stage is not None else cur

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(decode, spans[0]) if spans else None
        for i in range(len(spans)):
            cur = pending.result()
            pending = (
                pool.submit(decode, spans[i + 1])
                if i + 1 < len(spans) else None
            )
            yield cur


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


def _pad_cols(arr: np.ndarray, cols: int, mode: str = "symmetric") -> np.ndarray:
    """Pad the column axis (axis -1) to ``cols`` — the width half of the
    canonical-shape mechanism (ops/shapes.py): symmetric pad >= the
    Gaussian radius keeps the valid region's blur bit-identical; masks
    zero-pad. Band programs are then keyed on the bucketed width, so a
    whole-slide cohort with heterogeneous scanner geometry shares one
    program set instead of compiling per slide width."""
    have = arr.shape[-1]
    if have == cols:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[-1] = (0, cols - have)
    return np.pad(arr, pad, mode=mode)


def band_width(w: int, config) -> int:
    """Canonical (bucketed) band width for a slide of true width ``w``."""
    if not getattr(config, "canonical_shapes", True):
        return int(w)
    from ribca_tpu.ops.shapes import bucket_dim

    pad_min = halo_radius(config.blur) if config.normalize else 0
    return bucket_dim(w, pad_min)


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
    banded normalization. Bands run at the canonical (bucketed) width:
    symmetric column pads are duplicates of real pixels (max/min/has-
    signal unaffected) and the histogram masks them out, so statistics
    equal the true-width run while all slides share one program set."""
    c, h, w = image.shape
    wb = band_width(w, config)
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
    starts = _band_starts(h, band_rows)
    spans = [
        (max(s - halo, 0), min(min(s + band_rows, h) + halo, h))
        for s in starts
    ]
    def stage(raw):
        # upload in the source dtype (half the tunnel bytes of f32;
        # band_prenorm casts on device); pad + async put issued on the
        # prefetch thread (see _prefetch_spans for the measured
        # async-vs-forced A/B)
        d = jnp.asarray(
            _pad_cols(_pad_rows(raw, in_rows, mode="symmetric"), wb)
        )
        if os.environ.get("RIBCA_STAGE_FORCE", "0") == "1":
            d.block_until_ready()
        return d

    for s, band_dev in zip(starts, _prefetch_spans(image, spans, stage)):
        e = min(s + band_rows, h)
        lo = max(s - halo, 0)
        pre = band_prenorm(band_dev, blur=float(config.blur))
        # fixed-length interior slice (pad rows of the short bottom band
        # are symmetric duplicates, masked out of the histogram) — the
        # tail band reuses the SAME compiled stats program
        interior = pre[:, s - lo : s - lo + band_rows]
        hist, bmax, bpos = band_stats(interior, hi_dev, bins=bins,
                                      valid_w=w, valid_rows=e - s)
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


@functools.partial(jax.jit, donate_argnums=0)
def _insert_band(cache, band, row0):
    """Donated in-place row-block write into the contiguous prenorm
    cache (row0 is traced: one program per band shape)."""
    return jax.lax.dynamic_update_slice(cache, band, (0, row0, 0))


@functools.partial(jax.jit, static_argnames=("pad",))
def _pad_band(band, pad: int):
    """One-window bottom/right zero pad, applied ONCE per band so
    extract_patches(prepadded=True) never re-pads inside a chunk
    dispatch (the pad values are never read into valid window
    positions — window rows stay within the true band rows by the
    band-assignment contract)."""
    return jnp.pad(band, ((0, 0), (0, pad), (0, pad)))


# per-channel pixel count above which the exact select replaces the
# per-channel sort in prenorm_cached (crossover measured on v5e:
# sort ~0.5 s / select ~5 s at 9M px; sort ~45 s / select ~9 s at 151M)
SELECT_STATS_MIN_PIXELS = 32 << 20


def prenorm_cached(image, config, band_rows: int, pad_extra: int = 0,
                   tracer=None):
    """Pass A in single-upload cache mode.

    Each band of rows is decoded once (decode-ahead thread) and uploaded
    once in the SOURCE dtype over DISJOINT spans — Gaussian halo context is
    assembled on device from the neighboring raw bands, so the wire
    carries every pixel exactly once. The prenormed interiors land in ONE
    contiguous ``(C, h+pad_extra, wb+pad_extra)`` f32 HBM cache via
    donated in-place row writes; pixels beyond the written interiors stay
    NaN (the masked-normalization pad contract). ``pad_extra`` is the
    patch window: extraction gathers straight from the cache
    (extract_patches ``prepadded=True`` with fused scaling), with no
    per-band assembly/scale/zero passes and no per-chunk re-pad — at
    500k-cell whole-slide scale those full-band copies were ~100 GB of
    HBM traffic. Global normalization scalars use the EXACT
    jnp.percentile math (no histogram approximation — bit-identical to
    the single-shot path).

    Returns (cache, thresh, denom, scaled_min, has_signal).
    """
    c, h, w = image.shape
    wb = band_width(w, config)
    halo = halo_radius(config.blur)
    in_rows = band_rows + 2 * halo
    starts = _band_starts(h, band_rows)
    spans = [(s, min(s + band_rows, h)) for s in starts]
    n_b = len(spans)
    raw: list = [None] * n_b
    blur = float(config.blur)
    cache = jnp.full(
        (c, h + pad_extra, wb + pad_extra), jnp.nan, jnp.float32
    )

    def prenorm_one(i: int) -> None:
        nonlocal cache
        s, e = spans[i]
        top = raw[i - 1][:, -halo:] if (i > 0 and halo) else None
        bot = raw[i + 1][:, :halo] if (i + 1 < n_b and halo) else None
        pieces = [p for p in (top, raw[i], bot) if p is not None]
        x = (
            jnp.concatenate(pieces, axis=1) if len(pieces) > 1
            else pieces[0]
        )
        # symmetric pad only at the true image top/bottom (scipy 'reflect'
        # boundary) and up to the fixed compile shape for the last band
        pad_top = halo if i == 0 else 0
        pad_bot = in_rows - pad_top - x.shape[1]
        if pad_top or pad_bot:
            x = jnp.pad(x, ((0, 0), (pad_top, pad_bot), (0, 0)),
                        mode="symmetric")
        pre = band_prenorm(x, blur=blur)
        cache = _insert_band(cache, pre[:, halo : halo + (e - s)], s)

    def stage(arr):
        # canonical width: pad columns on host (symmetric), upload once,
        # issued ASYNC on the prefetch thread — band i+1's wire rides
        # behind band i's prenorm compute (see _prefetch_spans for the
        # measured async-vs-forced A/B; RIBCA_STAGE_FORCE=1 forces)
        d = jnp.asarray(_pad_cols(arr, wb))
        if os.environ.get("RIBCA_STAGE_FORCE", "0") == "1":
            d.block_until_ready()
        return d

    with trace_stage(tracer, "device.prenorm.bands", quiet=True):
        for i, decoded in enumerate(_prefetch_spans(image, spans, stage)):
            raw[i] = decoded
            if i >= 1:
                prenorm_one(i - 1)
                if i >= 2:
                    raw[i - 2] = None  # free: only the window stays raw
        if n_b:
            prenorm_one(n_b - 1)

    amax = float(config.upper_limit)
    # the histogram-refinement select beats the per-channel device sort
    # only at scale: its cost is ~5-7 host-driven rounds of tunnel round
    # trips (measured ~5 s at 3000²x7 where the sort takes ~0.5 s), while
    # the TPU sort blows up superlinearly (45 s at 12288²x7 where the
    # select takes ~9 s). Route by per-channel pixel count.
    use_select = (
        getattr(config, "exact_select_stats", True)
        and h * w > SELECT_STATS_MIN_PIXELS
    )
    if use_select:
        # histogram-refinement select (ops/quantile.py): the exact
        # nanpercentile scalars in a handful of O(N) passes instead of a
        # per-channel 150M-element device sort — bitwise identical
        # (test_quantile.py), and the dominant cost of this stage at
        # whole-slide scale (~45 s of a 60 s prenorm at 12288²x7) drops
        # to sub-second
        from ribca_tpu.ops.quantile import exact_norm_stats

        with trace_stage(tracer, "device.prenorm.stats", quiet=True):
            th, dn, sm, sg = exact_norm_stats(cache, amax, h * w, h, w)
        return (cache, jnp.asarray(th), jnp.asarray(dn),
                jnp.asarray(sm), jnp.asarray(sg))
    # canonical stats shape: slice each channel's rows at a bucket so the
    # (expensive) per-channel sort program is keyed on the bucket, not
    # the exact slide height; cache rows beyond h are already NaN
    if getattr(config, "canonical_shapes", True):
        from ribca_tpu.ops.shapes import bucket_dim

        hb = bucket_dim(h, 0)
    else:
        hb = h
    hp = h + pad_extra
    stats = []
    for i in range(c):  # per channel: sort workspace stays one channel
        if hb <= hp:
            ch = jax.lax.slice(cache, (i, 0, 0), (i + 1, hb, wb))[0]
        else:
            ch = jnp.pad(
                jax.lax.slice(cache, (i, 0, 0), (i + 1, hp, wb))[0],
                ((0, hb - hp), (0, 0)), constant_values=jnp.nan,
            )
        stats.append(stats_from_pre_channel(ch, amax, valid_w=w))
    thresh, denom, scaled_min, has_signal = (
        jnp.stack([s[k] for s in stats]) for k in range(4)
    )
    return cache, thresh, denom, scaled_min, has_signal


def run_image_tiled(
    image: np.ndarray,
    mask: np.ndarray,
    config,
    runner,
    band_rows: int | None = None,
    packer=None,
    tracer=None,
) -> ImageRecord:
    """Banded counterpart of engine.pipeline.run_image; same outputs.
    ``packer`` as in run_image: shared CohortPacker for cross-image tail
    packing (banded pieces submit with explicit row indices since cells
    arrive in band order, not id order)."""
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    mask = np.ascontiguousarray(mask).astype(np.int32)
    if not hasattr(image, "read_band"):  # streaming readers pass through
        image = np.asarray(image)
    c, h, w = image.shape
    wb = band_width(w, config)  # canonical width: one program set/cohort

    mesh = runner.mesh
    n_dev = mesh.size
    rep = replicated_sharding(mesh)
    sh = cell_sharding_axis1(mesh)

    patch_size = int(40 * config.cell_size / 30.0)
    if band_rows is None and getattr(config, "tiled_band_rows", 0):
        band_rows = int(config.tiled_band_rows)
    auto_rows = band_rows is None
    if auto_rows:
        budget = getattr(config, "device_image_budget_bytes", 1 << 31)
        band_rows = max(int(budget / (c * wb * 4 * 4)), 4 * patch_size)
    band_rows = min(band_rows, h)

    # single-upload cache mode: slide's f32 prenorm fits in HBM
    # (budgeted at the padded width actually cached)
    use_cache = bool(config.normalize) and (
        c * (h + patch_size) * (wb + patch_size) * 4
        <= prenorm_cache_budget(config, mesh)
    )
    pre_cache = None
    if use_cache and auto_rows:
        # smaller bands pipeline decode/upload/compute against each other;
        # disjoint uploads make the extra band count free on the wire
        # (halo context is assembled on device from neighboring bands)
        band_rows = min(
            band_rows,
            max(-(-h // 8), halo_radius(config.blur), 4 * patch_size),
        )
    if auto_rows and getattr(config, "canonical_shapes", True):
        # snap auto-sized bands DOWN to a power-of-two ladder: band
        # programs are keyed on (band_rows, wb), so heterogeneous slide
        # heights collapse onto a handful of programs (any band_rows is
        # exact; the short bottom band is masked, never recompiled)
        if band_rows >= 512:
            band_rows = 1 << (band_rows.bit_length() - 1)
    if use_cache:
        with trace_stage(tracer, "device.prenorm", quiet=True):
            pre_cache, thresh, denom, scaled_min, has_signal = (
                prenorm_cached(image, config, band_rows,
                               pad_extra=patch_size, tracer=tracer)
            )
        min_val = scaled_min
        thresh_d = jax.device_put(thresh, rep)
        denom_d = jax.device_put(denom, rep)
        signal_d = jax.device_put(has_signal, rep)
    elif config.normalize:
        with trace_stage(tracer, "device.prenorm", quiet=True):
            thresh, denom, scaled_min, has_signal = (
                compute_global_norm_stats(image, config, band_rows)
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

    with trace_stage(tracer, "host.extents", quiet=True):
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

    local_packer = packer is None
    if local_packer:
        from ribca_tpu.engine.packer import CohortPacker
        from ribca_tpu.engine.pipeline import pack_size

        from ribca_tpu.engine.pipeline import effective_prefetch_depth

        pk = pack_size(config, n_dev)
        packer = CohortPacker(
            runner, pk, c,
            prefetch_depth=effective_prefetch_depth(config, pk, c),
        )
    chunk = min(packer.pack, chunk_size_for(
        min(max(n, 1), config.chunk_cells), config.chunk_cells, n_dev
    ))
    sink = packer.make_sink(n)

    def pack_args(piece, size):
        """(5, size) stacked cell args — one upload per chunk (see
        engine/pipeline.pack_args)."""
        out = np.zeros((5, size), dtype=np.int32)
        n_sel = len(piece)
        out[0, :n_sel] = piece
        out[1, :n_sel] = ext.rmin[piece]
        out[2, :n_sel] = ext.rmax[piece]
        out[3, :n_sel] = ext.cmin[piece]
        out[4, :n_sel] = ext.cmax[piece]
        return out

    inflight: deque = deque()
    order_parts: list[np.ndarray] = []
    int_parts: list[np.ndarray] = []

    def drain(limit: int):
        while len(inflight) > limit:
            avg, n_valid, idx = inflight.popleft()
            with trace_stage(tracer, "device.drain", quiet=True):
                int_parts.append(np.asarray(avg[:n_valid]))
            order_parts.append(idx)

    def dispatch_piece(img_dev, mask_dev, piece, piece_idx, rec_off,
                       row_offset, scale_args):
        """One extract+submit dispatch over a (bucketed) cell piece."""
        n_valid = len(piece)
        size = chunk_size_for(max(n_valid, 1), chunk, n_dev)
        with trace_stage(tracer, "device.extract", quiet=True):
            cells = jax.device_put(pack_args(piece, size), sh)
            patches, avg_int = extract_patches(
                img_dev, min_val, mask_dev, cells,
                patch_size=patch_size, row_offset=row_offset, full_h=h,
                full_w=w, prepadded=True, **scale_args,
            )
            packer.submit(patches, n_valid, sink, rec_off)
        inflight.append((avg_int, n_valid, piece_idx))
        drain(packer.prefetch_depth)

    if use_cache:
        # global packed chunk loop straight off the contiguous cache
        # (mirrors engine.pipeline.run_image): no per-band assembly, no
        # per-band program boundaries, full-valid dispatch buckets
        with trace_stage(tracer, "device.band_assemble", quiet=True):
            mask_pad = np.zeros(
                (h + patch_size, wb + patch_size), np.int32
            )
            mask_pad[:h, :w] = mask
            mask_dev = jax.device_put(mask_pad, rep)
        scale_args = dict(thresh=thresh_d, denom=denom_d,
                          has_signal=signal_d)
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            dispatch_piece(pre_cache, mask_dev, ids[start:stop],
                           np.arange(start, stop), start, 0, scale_args)
    else:
        cell_bands = sorted(set(band_of.tolist())) if n else []
        if not cell_bands:
            raw_iter = iter(())
        else:
            spans = []
            for b in cell_bands:
                s = b * band_rows
                e = min(s + band_rows, h)
                spans.append(
                    (max(s - halo, 0), min(e + patch_size + halo, h))
                )

            def stage_band(arr):
                # pad + async put on the prefetch thread: the next
                # band's wire time overlaps this band's extract+ensemble
                # (see _prefetch_spans); normalize=False keeps the host
                # array — its per-band slicing is span-dependent
                if not config.normalize:
                    return arr
                d = jax.device_put(
                    jnp.asarray(_pad_cols(
                        _pad_rows(arr, in_rows, mode="symmetric"), wb
                    )),
                    rep,
                )
                if os.environ.get("RIBCA_STAGE_FORCE", "0") == "1":
                    d.block_until_ready()
                return d

            raw_iter = _prefetch_spans(image, spans, stage_band)

        for b in cell_bands:
            s = b * band_rows
            e = min(s + band_rows, h)
            # extraction rows [s, e + patch), prenorm needs halo context
            lo = max(s - halo, 0)
            if config.normalize:
                pre = band_prenorm(next(raw_iter), blur=float(config.blur))
                # scale + min shift fuse into the window kernel; the
                # one-window pad is applied ONCE per band, not per chunk
                band_img = _pad_band(
                    jax.lax.dynamic_slice_in_dim(
                        pre, s - lo, ext_rows, axis=1
                    ),
                    patch_size,
                )
                scale_args = dict(thresh=thresh_d, denom=denom_d,
                                  has_signal=signal_d)
            else:
                raw = next(raw_iter)
                band_img = jnp.asarray(_pad_cols(
                    _pad_rows(raw[:, s - lo :], ext_rows + patch_size,
                              mode="symmetric"),
                    wb + patch_size,
                )).astype(jnp.float32) - min_val[:, None, None]
                scale_args = {}

            mask_band = _pad_cols(
                _pad_rows(mask[s : e + patch_size],
                          ext_rows + patch_size),
                wb + patch_size,
                mode="constant",
            )
            mask_dev = jax.device_put(mask_band, rep)

            sel_idx = np.nonzero(band_of == b)[0]
            sel = ids[sel_idx]
            for start in range(0, len(sel), chunk):
                stop = min(start + chunk, len(sel))
                piece_idx = sel_idx[start:stop]
                dispatch_piece(band_img, mask_dev, sel[start:stop],
                               piece_idx, piece_idx, s, scale_args)
    drain(0)
    if local_packer:
        with trace_stage(tracer, "device.finalize", quiet=True):
            packer.finalize()

    # reassemble intensities into ascending-cell-id order (the packer
    # scatters probs straight into the sink by explicit row index)
    if order_parts:
        order = np.concatenate(order_parts)
        inv = np.argsort(order, kind="stable")
        intensity = ((np.concatenate(int_parts, axis=0) + 1.0) / 2.0)[inv]
    else:
        intensity = np.zeros((0, c), np.float32)

    return ImageRecord(
        cell_ids=ids,
        mean_row=ext.mean_row[ids],
        mean_col=ext.mean_col[ids],
        mask=mask,
        intensity_full=intensity,
        panel_probs=sink,
    )
