"""Per-channel image normalization as one jitted XLA program.

Replicates the reference ``ImageProcessor._normalize`` (preprocess.py:214-239)
exactly, but branchlessly and vmapped over channels so the whole CHW stack
normalizes in a single device dispatch:

  1. background = gaussian(channel, sigma=20), clipped at 125, subtracted,
     result clipped at 0;
  2. optional gaussian blur with sigma=blur;
  3. all-nonpositive channels become constant -1;
  4. upper clip at the ``amax`` percentile, only when that percentile > 20;
  5. scale to [-1, 1] via 2*(x / max(25, max(x))) - 1.

Data-dependent branches (percentile guard, empty-channel fill) are
jnp.where-selected, which is equivalent because every branch is a pure
elementwise rescale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.ops.gaussian import gaussian_blur

BG_SIGMA = 20.0
BG_CLIP = 125.0
PCT_GUARD = 20.0
SCALE_FLOOR = 25.0


def pinned_nanpercentile(ch: jnp.ndarray, amax: float) -> jnp.ndarray:
    """nan-aware ``amax``-percentile (linear method) with PINNED scalar
    rounding — the same order statistics and interpolation as
    ``jnp.nanpercentile``, but every scalar op rounds identically on every
    backend and in every enclosing graph:

    - ``q = amax/100`` is computed on the HOST in f32 (correctly rounded;
      XLA:CPU's runtime f32 divide is 1 ulp off for e.g. 99/100, while
      the same divide constant-folds to the correct value — so the bare
      op's rounding depends on whether q reaches the graph as an
      argument or a literal);
    - the valid count reduces in INT32 then converts, so the f32 tree-sum
      rounding of 1s can never differ between array shapes/backends.

    The final interpolation uses the single-mul lerp form
    ``lv + (hv-lv)*hw`` (numpy's ``_lerp``), NOT jax's two-mul
    ``lv*lw + hv*hw``: with two muls, XLA:CPU fuses a DIFFERENT mul into
    the FMA depending on the enclosing graph (measured: the in-graph
    chain contracts ``hv*hw``, a standalone scalar jit contracts
    ``lv*lw``, 1 ulp apart; an optimization_barrier does not stop the
    contraction). With one mul there is only one possible fma, so every
    graph rounds identically. ≤1 ulp from jnp.nanpercentile's form.

    Every normalize path (single-shot, shape-bucketed, banded two-pass
    refinement, banded cache select — ops/quantile.py replicates the
    position chain on the host and runs this interpolation as a scalar
    jit) shares this one definition, which is what makes the cross-path
    bit-identical claims hold. Matches np.percentile within the usual
    f32-vs-f64 sort/interp tolerance (the reference computes
    np.percentile, preprocess.py:229)."""
    flat = ch.ravel()
    s = jnp.sort(flat)
    cnt_i = jnp.sum(~jnp.isnan(flat), dtype=jnp.int32)
    counts = cnt_i.astype(jnp.float32)
    q = np.float32(np.float32(amax) / np.float32(100.0))
    t = q * (counts - 1)
    low = jnp.floor(t)
    high = jnp.ceil(t)
    high_w = t - low
    # the rank clamp runs in EXACT integers: above 2^24 valid pixels,
    # f32 ``counts - 1`` rounds back up to ``counts`` (e.g. n = 12288² =
    # 9·2^24), so an f32 clamp at amax=100 would gather one past the
    # last valid value — the first NaN pad — and return a NaN threshold,
    # where the host replica (ops/quantile._percentile_positions) clips
    # with the exact integer n-1 and returns the channel max.
    nm1_i = jnp.maximum(cnt_i - 1, 0)
    lv = s[jnp.clip(low.astype(jnp.int32), 0, nm1_i)]
    hv = s[jnp.clip(high.astype(jnp.int32), 0, nm1_i)]
    return lv + (hv - lv) * high_w


def _normalize_channel(ch: jnp.ndarray, blur: float, amax: float) -> jnp.ndarray:
    ch = ch.astype(jnp.float32)

    bg = gaussian_blur(ch, BG_SIGMA, mode="reflect")
    bg = jnp.minimum(bg, BG_CLIP)
    ch = jnp.clip(ch - bg, 0.0, None)

    if blur:
        ch = gaussian_blur(ch, float(blur), mode="reflect")

    has_signal = jnp.any(ch > 0)

    # the PINNED percentile, not jnp.nanpercentile: backend scalar
    # rounding of the bare op varies with graph context (misrounded
    # runtime divide, FMA contraction) — one pinned implementation
    # everywhere keeps single-shot, bucketed, and tiled-cache results
    # bitwise identical by construction.
    thresh = pinned_nanpercentile(ch, amax)
    clipped = jnp.where(thresh > PCT_GUARD, jnp.clip(ch, 0.0, thresh), ch)

    denom = jnp.maximum(SCALE_FLOOR, jnp.max(clipped))
    scaled = 2.0 * (clipped / denom) - 1.0

    return jnp.where(has_signal, scaled, jnp.full_like(ch, -1.0))


@functools.partial(jax.jit, static_argnames=("blur", "amax"))
def normalize_image(img: jnp.ndarray, blur: float = 0.0, amax: float = 100.0):
    """Normalize a CHW stack; returns float32 in [-1, 1]."""
    fn = functools.partial(_normalize_channel, blur=blur, amax=amax)
    return jax.vmap(fn)(img.astype(jnp.float32))


# -- canonical-shape (padded) variant ------------------------------------------
#
# Shape-bucketed uploads (ops/shapes.py) carry symmetric bottom/right padding
# so one program serves a whole cohort. The Gaussian steps run over the padded
# array (pad >= kernel radius + 'symmetric' boundary => valid region equal to
# the unpadded reflect-mode filter — bitwise for the single bg conv; a chained
# blur conv's accumulation order varies across padded widths, ~1e-5 allclose,
# test_shapes.py); the global statistics must see
# ONLY the true pixels. Pad pixels become NaN and the stats use the nan-aware
# reductions — jnp.nanpercentile's squash-NaNs path computes the identical
# sort + linear interpolation over the valid count, so the result is bitwise
# equal to jnp.percentile over the unpadded image. Output pads stay NaN
# (loud if ever consumed); the patch gather clamps at the true extents.


def _normalize_channel_masked(ch, valid, blur: float, amax: float):
    ch = ch.astype(jnp.float32)

    bg = gaussian_blur(ch, BG_SIGMA, mode="reflect")
    bg = jnp.minimum(bg, BG_CLIP)
    ch = jnp.clip(ch - bg, 0.0, None)
    if blur:
        ch = gaussian_blur(ch, float(blur), mode="reflect")

    chm = jnp.where(valid, ch, jnp.nan)
    has_signal = jnp.any(chm > 0)          # NaN > 0 is False
    thresh = pinned_nanpercentile(chm, amax)
    clipped = jnp.where(thresh > PCT_GUARD, jnp.clip(chm, 0.0, thresh), chm)
    denom = jnp.maximum(SCALE_FLOOR, jnp.nanmax(clipped))
    scaled = 2.0 * (clipped / denom) - 1.0
    return jnp.where(has_signal, scaled, jnp.full_like(ch, -1.0))


@functools.partial(jax.jit, static_argnames=("blur", "amax"))
def normalize_image_masked(img: jnp.ndarray, valid_h, valid_w,
                           blur: float = 0.0, amax: float = 100.0):
    """Normalize a shape-bucketed CHW stack whose true extent is
    (valid_h, valid_w) — traced scalars, so every image in a bucket reuses
    this program. Valid region matches ``normalize_image`` on the unpadded
    image bitwise for ``blur=0``; a nonzero blur chains a second conv
    whose accumulation order differs across padded widths, weakening the
    match to ~1e-5 allclose (test_shapes.py). Pad pixels return NaN."""
    _, h, w = img.shape
    valid = (jnp.arange(h)[:, None] < valid_h) & (
        jnp.arange(w)[None, :] < valid_w
    )
    fn = functools.partial(
        _normalize_channel_masked, valid=valid, blur=blur, amax=amax
    )
    return jax.vmap(fn)(img.astype(jnp.float32))


@jax.jit
def cast_f32_masked(img: jnp.ndarray, valid_h, valid_w):
    """normalize=False counterpart: f32 cast with NaN pads, so the masked
    min/zero-shift in the pipeline sees only true pixels."""
    _, h, w = img.shape
    valid = (jnp.arange(h)[:, None] < valid_h) & (
        jnp.arange(w)[None, :] < valid_w
    )
    return jnp.where(valid, img.astype(jnp.float32), jnp.nan)


# -- tiled (banded) two-pass pieces (engine/tiled.py) -------------------------
#
# Whole slides can exceed HBM; the tiled pipeline streams row bands. Steps
# 1-2 (background subtract + blur) are local given a halo of the Gaussian
# radius and run per band; steps 3-5 need global per-channel statistics
# (any>0, the amax percentile, the max), gathered in a first pass as
# histograms/extrema and applied branchlessly in a second pass.

HIST_BINS = 8192


def halo_radius(blur: float) -> int:
    """Rows of context a band needs for exact Gaussian edges (scipy
    truncate=4.0): bg sigma 20 -> 80, plus the optional blur radius."""
    r = int(4.0 * BG_SIGMA + 0.5)
    if blur:
        r += int(4.0 * float(blur) + 0.5)
    return r


@functools.partial(jax.jit, static_argnames=("blur",))
def band_prenorm(band: jnp.ndarray, blur: float = 0.0):
    """Steps 1-2 on a (C, Hb, W) band (with halo rows included): background
    subtract + optional blur. Returns the pre-clip band, f32 >= 0."""

    def one(ch):
        ch = ch.astype(jnp.float32)
        bg = gaussian_blur(ch, BG_SIGMA, mode="reflect")
        bg = jnp.minimum(bg, BG_CLIP)
        ch = jnp.clip(ch - bg, 0.0, None)
        if blur:
            ch = gaussian_blur(ch, float(blur), mode="reflect")
        return ch

    return jax.vmap(one)(band)


@functools.partial(jax.jit, static_argnames=("bins",))
def band_stats(pre: jnp.ndarray, hi: jnp.ndarray, bins: int = HIST_BINS,
               valid_w=None, valid_rows=None):
    """Per-channel (histogram, max, count>0) of a pre-clip band.

    ``hi`` is a per-channel upper range (the raw per-channel max is a safe
    bound since bg-subtraction only lowers values). ``valid_w`` /
    ``valid_rows`` (traced) exclude canonical-shape pad columns / tail
    pad rows from the histogram — symmetric pads are DUPLICATES of real
    pixels, so max and has-signal stay correct but counts would inflate
    and shift the percentile. Masking them keeps every band (including
    the short bottom band) on ONE compiled program."""
    if valid_w is None:
        valid_w = pre.shape[-1]
    if valid_rows is None:
        valid_rows = pre.shape[-2]
    valid2d = (
        (jnp.arange(pre.shape[-2])[:, None] < valid_rows)
        & (jnp.arange(pre.shape[-1])[None, :] < valid_w)
    ).astype(jnp.int32)

    def one(ch, h):
        scaled = jnp.clip(ch / jnp.maximum(h, 1e-30) * bins, 0, bins - 1)
        idx = scaled.astype(jnp.int32).reshape(-1)
        hist = jnp.zeros((bins,), jnp.int32).at[idx].add(
            valid2d.reshape(-1)
        )
        return hist, jnp.max(ch), jnp.sum(ch > 0)

    return jax.vmap(one)(pre, hi)


def percentile_from_hist(hist: np.ndarray, hi: float, q: float,
                         total: int) -> float:
    """Approximate np.percentile(x, q) from a fixed-range histogram
    (linear interpolation inside the selected bin; error <= hi/HIST_BINS)."""
    bins = len(hist)
    target = q / 100.0 * (total - 1)
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, target + 1))
    b = min(b, bins - 1)
    prev = cum[b - 1] if b > 0 else 0
    inside = max(int(hist[b]), 1)
    frac = (target + 1 - prev) / inside
    return (b + np.clip(frac, 0.0, 1.0)) * hi / bins


@functools.partial(jax.jit, static_argnames=("amax",))
def stats_from_pre_channel(ch: jnp.ndarray, amax: float, valid_w=None):
    """EXACT normalization scalars (thresh, denom, scaled_min, has_signal)
    for one prenormed channel — the same nanpercentile/max math as
    ``_normalize_channel`` steps 3-5, so a banded run whose prenormed
    pixels are device-resident reproduces the single-shot path bit-for-bit
    (no histogram approximation). Called per channel (Python loop) so the
    sort workspace never exceeds one channel. ``valid_w`` (traced) masks
    width-canonicalization pad columns to NaN — the nanpercentile
    squash-NaN path then sorts exactly the true pixels, the identical
    mechanism normalize_image_masked uses."""
    if valid_w is not None:
        col = jnp.arange(ch.shape[-1]) < valid_w
        ch = jnp.where(col[None, :], ch, jnp.nan)
    has_signal = jnp.any(ch > 0)
    thresh = pinned_nanpercentile(ch, amax)
    clipped = jnp.where(thresh > PCT_GUARD, jnp.clip(ch, 0.0, thresh), ch)
    denom = jnp.maximum(SCALE_FLOOR, jnp.nanmax(clipped))
    # min of the scaled channel: scaling is monotone, so it is attained at
    # the prenorm minimum and computed with the identical f32 expression
    gmin = jnp.nanmin(ch)
    scaled_min = jnp.where(
        has_signal, 2.0 * (gmin / denom) - 1.0, jnp.float32(-1.0)
    )
    return thresh, denom, scaled_min, has_signal


@jax.jit
def band_apply_scale(pre, thresh, denom, has_signal):
    """Steps 3-5 with global host-computed per-channel scalars: clip at
    thresh where thresh > PCT_GUARD, scale by max(25, denom), empty
    channels -> -1 (branchless, preprocess.py:229-238)."""

    def one(ch, t, d, s):
        clipped = jnp.where(t > PCT_GUARD, jnp.clip(ch, 0.0, t), ch)
        scaled = 2.0 * (clipped / d) - 1.0
        return jnp.where(s, scaled, jnp.full_like(ch, -1.0))

    return jax.vmap(one)(pre, thresh, denom, has_signal)
