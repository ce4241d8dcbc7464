"""Exact percentile without the device sort: histogram-refinement select.

The single-upload whole-slide path (engine/tiled.prenorm_cached) needs the
EXACT per-channel ``jnp.nanpercentile`` threshold so banded runs stay
bit-identical to the single-shot normalizer (reference semantics:
preprocess.py:214-239 computes np.percentile over the full channel).
``jnp.nanpercentile`` lowers to a full `lax.sort` — tens of seconds per
150M-pixel channel on TPU, and it was the dominant cost of the whole-slide
prenorm stage (~45 s of a 60 s stage at 12288²×7).

A percentile needs only TWO order statistics (the floor/ceil ranks of
``q/100*(n-1)``), not a total order.  This module finds the exact k-th
smallest valid pixel with iterative histogram refinement — a radix-select:

  round:  one O(N) fused pass computes, per channel, a ``bins``-bin count
          histogram of the values inside the current [lo, hi) bracket,
          the number of valid values below ``lo``, the in-bracket
          min / max, the multiplicity of that min and max, and the
          in-bracket count;
  host:   locates the bin containing the target rank from the histogram
          cumsum and narrows the bracket to that bin ±1 (the one-bin
          margin absorbs any f32 edge rounding — membership is re-counted
          exactly from scratch each round, so bracket slack never skews
          the rank bookkeeping);
  stop:   when the bracket holds at most two DISTINCT values
          (min-count + max-count == in-count) the rank picks one of them
          directly; a bracket collapse that never reaches that state
          (adversarial ulp-spaced clusters) falls back to the sort path
          for that channel, so the result is exact by construction.

Each round reads the channel once (memory-bound) instead of sorting it;
3-6 rounds resolve real images.  The position/interpolation scalar chain
replicates ``ops.normalize.pinned_nanpercentile`` op-for-op in host
float32 — pinning is what makes host replication possible at all: bare
``jnp.nanpercentile``'s scalar rounding varies with backend and graph
context (misrounded XLA:CPU runtime divide, fusion-dependent FMA
contraction), which no host chain can track. Bitwise equality with the
production stats (stats_from_pre_channel) is asserted exhaustively in
tests/test_quantile.py.

Pixels outside (valid_h, valid_w) are excluded: NaN pads are ignored by
the comparisons; duplicate symmetric pad COLUMNS (the banded width
canonicalization pads real values, engine/tiled._pad_cols) are masked by
the traced ``valid_w`` bound, matching stats_from_pre_channel's masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 256 bins: the iota-equality histogram costs ~linearly in bins; 256
# still shrinks the bracket ~85x per round (b±1 margin), resolving
# real slides in ~5-7 O(N) passes
SELECT_BINS = 256
MAX_ROUNDS = 28
# one-dispatch device loop HBM guard (orderstats_select): full-C single
# dispatch up to this slab size; above it, channel chunks of the byte
# size below (the loop program peaks at ~2.4x its argument slab)
SELECT_LOOP_SLAB_MAX = 5 << 30
SELECT_LOOP_CHUNK_BYTES = 2 << 30


def _bin_hist(idx, inr, bins: int):
    """Exact in-bracket bin counts; formulation routed by backend.

    TPU: iota-equality reduce — the (N,)-element scatter-add lowers ~10x
    under HBM bandwidth there (measured 2.1 s per 268M-element block vs
    0.11 s for this form at bins=256; scatter serialization), and it was
    the entire cost of the whole-slide stats stage. CPU: the scatter IS
    the fast path (the broadcast compare materializes (N, bins) there —
    a 5x test-suite slowdown measured). Both produce identical integer
    counts, so the routing cannot change results."""
    if jax.default_backend() == "cpu":
        return jnp.zeros((bins,), jnp.int32).at[idx.reshape(-1)].add(
            inr.reshape(-1).astype(jnp.int32)
        )
    return jnp.sum(
        (idx[:, :, None] == jnp.arange(bins, dtype=jnp.int32))
        & inr[:, :, None],
        axis=(0, 1), dtype=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("bins",))
def _select_round(x, lo, hi, valid_h, valid_w, bins: int = SELECT_BINS):
    """One refinement pass over a (C, H, W) stack.

    Returns per channel: (hist[bins], count_below_lo, in_min, in_max,
    n_min, n_max, in_count). All counts are over VALID in-bracket pixels;
    NaNs fail every comparison and drop out.
    """
    rows = jnp.arange(x.shape[1])[:, None] < valid_h
    cols = jnp.arange(x.shape[2])[None, :] < valid_w
    valid = rows & cols

    def one(ch, l, h):
        inr = valid & (ch >= l) & (ch < h)
        c_less = jnp.sum(valid & (ch < l), dtype=jnp.int32)
        width = jnp.maximum(h - l, jnp.float32(1e-45))
        idx = jnp.clip(
            ((ch - l) * (jnp.float32(bins) / width)).astype(jnp.int32),
            0, bins - 1,
        )
        hist = _bin_hist(idx, inr, bins)
        in_min = jnp.min(jnp.where(inr, ch, jnp.inf))
        in_max = jnp.max(jnp.where(inr, ch, -jnp.inf))
        n_min = jnp.sum(inr & (ch == in_min), dtype=jnp.int32)
        n_max = jnp.sum(inr & (ch == in_max), dtype=jnp.int32)
        return (hist, c_less, in_min, in_max, n_min, n_max,
                jnp.sum(inr, dtype=jnp.int32))

    return jax.vmap(one)(x, lo, hi)


# one full-stack _select_round materializes an int32 bin-index array the
# size of the stack (the scatter-add's indices cannot fuse away): at
# whole-slide scale that was a 4.6 GB HLO temp on top of the 4.26 GB
# prenorm cache — an 19.1 GB program on a 15.75 GB chip (observed OOM,
# r4). Stacks above this element count run the round in row blocks.
SELECT_BLOCK_ELEMS = 640 << 20  # ~2.5 GB of f32 per block:
# fewer blocks = fewer per-round tunnel round trips; the block
# slice + fused reduce temps stay well under HBM next to the
# 4.26 GB whole-slide cache


@functools.partial(jax.jit, static_argnames=("bins", "rows"))
def _select_round_block(x, start, r0c, lo, hi, valid_h, valid_w,
                        bins: int, rows: int):
    """_select_round over the row block [start, start+rows) of ``x``,
    sliced on device (``r0c`` = clamped slice origin; rows the slice
    re-reads below ``start`` are masked out so overlap never
    double-counts)."""
    blk = jax.lax.dynamic_slice_in_dim(x, r0c, rows, axis=1)
    grow = r0c + jnp.arange(rows)
    rvalid = (grow[:, None] >= start) & (grow[:, None] < valid_h)
    cols = jnp.arange(x.shape[2])[None, :] < valid_w
    valid = rvalid & cols

    def one(ch, l, h):
        inr = valid & (ch >= l) & (ch < h)
        c_less = jnp.sum(valid & (ch < l), dtype=jnp.int32)
        width = jnp.maximum(h - l, jnp.float32(1e-45))
        idx = jnp.clip(
            ((ch - l) * (jnp.float32(bins) / width)).astype(jnp.int32),
            0, bins - 1,
        )
        hist = _bin_hist(idx, inr, bins)
        in_min = jnp.min(jnp.where(inr, ch, jnp.inf))
        in_max = jnp.max(jnp.where(inr, ch, -jnp.inf))
        n_min = jnp.sum(inr & (ch == in_min), dtype=jnp.int32)
        n_max = jnp.sum(inr & (ch == in_max), dtype=jnp.int32)
        return (hist, c_less, in_min, in_max, n_min, n_max,
                jnp.sum(inr, dtype=jnp.int32))

    return jax.vmap(one)(blk, lo, hi)


def _use_device_loop() -> bool:
    """Route the refinement walk: the single-dispatch device loop on
    accelerators (no per-round tunnel RTTs), the host-driven loop on
    CPU (where the iota-reduce is slow and RTTs are free). Both produce
    bitwise-identical results; ``RIBCA_SELECT_DEVICE_LOOP=0/1``
    overrides (tests force both on CPU)."""
    import os

    env = os.environ.get("RIBCA_SELECT_DEVICE_LOOP")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() != "cpu"


def _f32_down(v64: np.float64) -> np.float32:
    """Largest f32 <= v64 (round toward -inf)."""
    f = np.float32(v64)
    if np.float64(f) > v64:
        return np.nextafter(f, np.float32(-np.inf))
    return f


def _f32_up(v64: np.float64) -> np.float32:
    """Smallest f32 >= v64 (round toward +inf)."""
    f = np.float32(v64)
    if np.float64(f) < v64:
        return np.nextafter(f, np.float32(np.inf))
    return f


def _select_round_any(x, lo, hi, valid_h, valid_w, bins: int):
    """Route one refinement pass whole-stack or blocked by size; blocked
    results merge exactly (hist/counts sum; extrema min/max with their
    multiplicities summed over the blocks attaining them)."""
    c, h, w = x.shape
    if c * h * w <= SELECT_BLOCK_ELEMS:
        return _select_round(x, lo, hi, valid_h, valid_w, bins=bins)
    rows = max(SELECT_BLOCK_ELEMS // max(c * w, 1), 128)
    parts = []
    for start in range(0, h, rows):
        r0c = min(start, max(h - rows, 0))
        parts.append([
            np.asarray(a) for a in _select_round_block(
                x, start, r0c, lo, hi, valid_h, valid_w,
                bins=bins, rows=min(rows, h),
            )
        ])
    hist = np.sum([p[0] for p in parts], axis=0)
    c_less = np.sum([p[1] for p in parts], axis=0, dtype=np.int64)
    mins = np.stack([p[2] for p in parts])        # (B, C)
    maxs = np.stack([p[3] for p in parts])
    in_min = mins.min(axis=0)
    in_max = maxs.max(axis=0)
    n_min = np.sum(
        np.stack([p[4] for p in parts]) * (mins == in_min[None]), axis=0
    )
    n_max = np.sum(
        np.stack([p[5] for p in parts]) * (maxs == in_max[None]), axis=0
    )
    in_cnt = np.sum([p[6] for p in parts], axis=0, dtype=np.int64)
    return hist, c_less, in_min, in_max, n_min, n_max, in_cnt


@functools.partial(jax.jit, static_argnames=("bins", "max_rounds"))
def _select_device_loop(x, r1, r2, lo0, hi0, valid_h, valid_w,
                        bins: int, max_rounds: int):
    """The ENTIRE bracket-refinement walk as one device program
    (lax.while_loop): on a tunneled TPU the host-driven loop pays
    (rounds x blocks) round trips — measured 9 s quiet / 24 s contended
    for ~5 rounds at 12288²x7 where the per-round device compute is
    0.72 s — so the narrowing logic runs on device and ONE dispatch
    returns every channel's order statistics (or a failed flag for the
    sort fallback).

    Narrowing parity with the host loop: the bin containing each rank
    is located from EXACT in-bracket counts each round, so bracket
    arithmetic only has to keep the target inside [lo, hi) — edges are
    computed in f32 (no f64 on TPU) and pushed one ulp OUTWARD with
    nextafter, which the ±1-bin margin absorbs by orders of magnitude.
    Converged values are exact order statistics regardless of the walk,
    so results are bitwise identical to the host loop's (pinned by
    test_quantile.py::test_device_loop_matches_host).

    Returns (vals (C, 2) f32 for ranks r1 <= r2, done (C,), failed (C,)).
    """
    c = x.shape[0]
    rows = jnp.arange(x.shape[1])[:, None] < valid_h
    cols = jnp.arange(x.shape[2])[None, :] < valid_w
    valid = rows & cols
    iota = jnp.arange(bins, dtype=jnp.int32)

    def one(ch, l, h):
        inr = valid & (ch >= l) & (ch < h)
        c_less = jnp.sum(valid & (ch < l), dtype=jnp.int32)
        width = jnp.maximum(h - l, jnp.float32(1e-45))
        idx = jnp.clip(
            ((ch - l) * (jnp.float32(bins) / width)).astype(jnp.int32),
            0, bins - 1,
        )
        hist = jnp.sum(
            (idx[:, :, None] == iota) & inr[:, :, None],
            axis=(0, 1), dtype=jnp.int32,
        )
        in_min = jnp.min(jnp.where(inr, ch, jnp.inf))
        in_max = jnp.max(jnp.where(inr, ch, -jnp.inf))
        n_min = jnp.sum(inr & (ch == in_min), dtype=jnp.int32)
        n_max = jnp.sum(inr & (ch == in_max), dtype=jnp.int32)
        return (hist, c_less, in_min, in_max, n_min, n_max,
                jnp.sum(inr, dtype=jnp.int32))

    def body(state):
        lo, hi, done, failed, vals, it = state
        hist, c_less, in_min, in_max, n_min, n_max, in_cnt = (
            jax.vmap(one)(x, lo, hi)
        )
        r_in1 = r1 - c_less
        r_in2 = r2 - c_less
        bad = ~(
            (r_in1 >= 0) & (r_in1 < in_cnt)
            & (r_in2 >= 0) & (r_in2 < in_cnt)
        )
        two = (n_min + n_max) >= in_cnt
        v1 = jnp.where(r_in1 < n_min, in_min, in_max)
        v2 = jnp.where(r_in2 < n_min, in_min, in_max)

        cum = jnp.cumsum(hist, axis=1)
        b1 = jnp.sum(cum < r_in1[:, None] + 1, axis=1, dtype=jnp.int32)
        b2 = jnp.sum(cum < r_in2[:, None] + 1, axis=1, dtype=jnp.int32)
        w = hi - lo
        e_lo = lo + (jnp.minimum(b1, b2) - 1).astype(jnp.float32) * (
            w / jnp.float32(bins)
        )
        e_hi = lo + (jnp.maximum(b1, b2) + 2).astype(jnp.float32) * (
            w / jnp.float32(bins)
        )
        new_lo = jnp.maximum(jnp.nextafter(e_lo, jnp.float32(-jnp.inf)),
                             lo)
        new_hi = jnp.minimum(jnp.nextafter(e_hi, jnp.float32(jnp.inf)),
                             hi)
        stalled = (new_lo == lo) & (new_hi == hi)

        act = ~(done | failed)
        resolve = act & ~bad & two
        vals = jnp.where(resolve[:, None],
                         jnp.stack([v1, v2], axis=1), vals)
        done = done | resolve
        failed = failed | (act & (bad | (~two & stalled)))
        step = act & ~bad & ~two & ~stalled
        lo = jnp.where(step, new_lo, lo)
        hi = jnp.where(step, new_hi, hi)
        return lo, hi, done, failed, vals, it + 1

    def cond(state):
        _, _, done, failed, _, it = state
        return jnp.any(~(done | failed)) & (it < max_rounds)

    state = (
        lo0, hi0,
        jnp.zeros((c,), bool), jnp.zeros((c,), bool),
        jnp.zeros((c, 2), jnp.float32), jnp.int32(0),
    )
    lo, hi, done, failed, vals, _ = jax.lax.while_loop(cond, body, state)
    # rounds exhausted with work left counts as failed
    failed = failed | ~(done | failed)
    return vals, done, failed


@jax.jit
def _channel_extrema(x, valid_h, valid_w):
    """Per-channel (nanmax, nanmin, any>0) respecting the valid bounds.
    Duplicate pad columns cannot change extrema/any, but masking keeps the
    contract uniform (and rows beyond valid_h may be NaN anyway)."""
    rows = jnp.arange(x.shape[1])[:, None] < valid_h
    cols = jnp.arange(x.shape[2])[None, :] < valid_w
    valid = rows & cols

    def one(ch):
        chm = jnp.where(valid, ch, jnp.nan)
        # exact valid counts: the f32 one mirrors pinned_nanpercentile's
        # int-reduce-then-convert count; the int one guards the
        # shared-ranks assumption against interior NaNs
        cnt_i = jnp.sum(~jnp.isnan(chm), dtype=jnp.int32)
        cnt = cnt_i.astype(jnp.float32)
        return (jnp.nanmax(chm), jnp.nanmin(chm), jnp.any(chm > 0),
                cnt, cnt_i)

    return jax.vmap(one)(x)


@jax.jit
def _finalize_one(x, i, thresh, gmin, has_signal, valid_h, valid_w):
    """Device-side steps 4-5 scalars for ONE channel given its exact
    percentile threshold: the identical expressions as
    stats_from_pre_channel.
    """
    from ribca_tpu.ops.normalize import PCT_GUARD, SCALE_FLOOR

    # traced channel index: ONE compiled program for all channels, and the
    # slice fuses into the reductions (no 600 MB channel copy at slide scale)
    ch = jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False)
    rows = jnp.arange(ch.shape[0])[:, None] < valid_h
    cols = jnp.arange(ch.shape[1])[None, :] < valid_w
    chm = jnp.where(rows & cols, ch, jnp.nan)

    clipped = jnp.where(thresh > PCT_GUARD, jnp.clip(chm, 0.0, thresh), chm)
    denom = jnp.maximum(SCALE_FLOOR, jnp.nanmax(clipped))
    scaled_min = jnp.where(
        has_signal, 2.0 * (gmin / denom) - 1.0, jnp.float32(-1.0)
    )
    return denom, scaled_min


def orderstats_select(x, ranks, n_valid: int, valid_h, valid_w,
                      ch_min=None, ch_max=None,
                      bins: int = SELECT_BINS, fallback=None):
    """Exact ascending order statistics of the valid pixels of each channel.

    ``x``: (C, H, W) f32 device array (NaN pads allowed). ``ranks``: 0-based
    ranks into the ascending valid order, identical for every channel (the
    percentile rank depends only on q and n). ``n_valid`` = count of valid
    pixels per channel (static). Returns np.float32 (C, len(ranks)).

    ``fallback`` (rank -> np (C,) values) covers the theoretical
    non-convergence corner; defaults to the jnp.nanpercentile-equivalent
    sort on the masked channel.
    """
    c = x.shape[0]
    ranks = [int(r) for r in ranks]
    if not all(0 <= r < n_valid for r in ranks):
        raise ValueError(f"ranks {ranks} out of range for n={n_valid}")
    if ch_min is None or ch_max is None:
        mx, mn, _, _, _ = _channel_extrema(x, valid_h, valid_w)
        ch_max = np.asarray(mx) if ch_max is None else ch_max
        ch_min = np.asarray(mn) if ch_min is None else ch_min
    out = np.empty((c, len(ranks)), np.float32)

    if _use_device_loop():
        lo0_np = np.asarray(ch_min, np.float32)
        hi0_np = np.nextafter(
            np.asarray(ch_max, np.float32), np.float32(np.inf)
        ).astype(np.float32)
        # HBM guard: the one-dispatch loop materializes ~2.4x the slab
        # (the (C,H,W) f32 argument + an i32 bin-index temp of the same
        # extent) — fine at 12288²x7 (4.2 GB slab) but at 16384²x7 the
        # 7.6 GB slab pushed the program to 16.4 GB next to the resident
        # prenorm cache and OOMed (observed on v5e, 1M-cell validation).
        # Above the slab threshold, run the SAME loop over channel
        # chunks sized to ~2 GB each: identical per-channel walks, a
        # handful of extra dispatches, bounded temps.
        hw_bytes = int(x.shape[1]) * int(x.shape[2]) * 4
        slab = c * hw_bytes
        per = (c if slab <= SELECT_LOOP_SLAB_MAX
               else max(1, int(SELECT_LOOP_CHUNK_BYTES // hw_bytes)))
        vals_parts, done_parts = [], []
        for s in range(0, c, per):
            vs, ds, _fs = _select_device_loop(
                x[s:s + per], jnp.int32(ranks[0]), jnp.int32(ranks[-1]),
                jnp.asarray(lo0_np[s:s + per]),
                jnp.asarray(hi0_np[s:s + per]),
                valid_h, valid_w, bins=bins, max_rounds=MAX_ROUNDS,
            )
            vals_parts.append(np.asarray(vs))
            done_parts.append(np.asarray(ds))
        done = np.concatenate(done_parts) if done_parts else np.zeros(
            (0,), bool)
        vals = np.concatenate(vals_parts) if vals_parts else np.zeros(
            (0, 2), np.float32)
        for j in range(len(ranks)):
            out[:, j] = vals[:, 0 if ranks[j] == ranks[0] else 1]
        pending = np.flatnonzero(~done)
        if len(pending):
            import sys

            print(
                "ribca_tpu quantile: device select loop fell back for "
                f"channels {pending.tolist()} (narrow-bracket stall or "
                "rank slip) — exact sort fallback",
                file=sys.stderr,
            )
            if fallback is not None:
                for j, r in enumerate(ranks):
                    fb_vals = fallback(r)
                    for i in pending:
                        out[i, j] = fb_vals[i]
            else:
                out[pending] = _sort_fallback_channels(
                    x, valid_h, valid_w, ranks, pending
                )
        return out

    # ONE bracket walk resolves every rank: the percentile's floor/ceil
    # ranks are adjacent, so they share the bracket (identical or
    # neighboring bins) until the final rounds — narrowing to the UNION
    # of the ranks' bins ±1 costs at most 2 extra bins out of ``bins``
    # per round while halving the O(N) device passes vs per-rank loops.
    lo = np.asarray(ch_min, np.float32).copy()
    # open upper bracket: one ulp above the max so max-valued pixels
    # are in-bracket under the strict `< hi` test
    hi = np.nextafter(
        np.asarray(ch_max, np.float32), np.float32(np.inf)
    ).astype(np.float32)
    done = np.zeros((c,), bool)
    failed = np.zeros((c,), bool)
    fail_reason = {}
    for _ in range(MAX_ROUNDS):
        hist, c_less, in_min, in_max, n_min, n_max, in_cnt = (
            np.asarray(a) for a in _select_round_any(
                x, jnp.asarray(lo), jnp.asarray(hi),
                valid_h, valid_w, bins=bins,
            )
        )
        for i in range(c):
            if done[i] or failed[i]:
                continue
            r_ins = [r - int(c_less[i]) for r in ranks]
            if not all(0 <= r_in < int(in_cnt[i]) for r_in in r_ins):
                # bracket slipped past a rank (cannot happen with the
                # ±1-bin margin; guard loudly -> exact sort fallback)
                failed[i] = True
                fail_reason[i] = (
                    f"rank-slip r_ins={r_ins} c_less={int(c_less[i])} "
                    f"in_cnt={int(in_cnt[i])} lo={lo[i]} hi={hi[i]}"
                )
                continue
            if int(n_min[i]) + int(n_max[i]) >= int(in_cnt[i]):
                # <= 2 distinct values left: every rank picks directly
                for j, r_in in enumerate(r_ins):
                    out[i, j] = (in_min[i] if r_in < int(n_min[i])
                                 else in_max[i])
                done[i] = True
                continue
            cum = np.cumsum(hist[i])
            bs = [int(np.searchsorted(cum, r_in + 1)) for r_in in r_ins]
            w = np.float64(hi[i]) - np.float64(lo[i])
            e_lo = np.float64(lo[i]) + (min(bs) - 1) * w / bins
            e_hi = np.float64(lo[i]) + (max(bs) + 2) * w / bins
            # DIRECTED f32 rounding of the bracket edges: nearest-rounding
            # the upper edge can round DOWN past the target value, leaving
            # an empty [a, a) bracket with the answer exactly at a
            # (observed on the 12288²x7 slide: every channel rank-slipped
            # at lo == hi and fell back to the 45 s sort). Lower edge
            # rounds down, upper edge rounds up — the rank invariant
            # "target in [lo, hi)" then survives every round.
            new_lo = np.float32(max(_f32_down(e_lo), lo[i]))
            new_hi = np.float32(min(_f32_up(e_hi), hi[i]))
            if new_lo == lo[i] and new_hi == hi[i]:
                # bracket can no longer shrink in f32 with >2 distinct
                # values inside (ulp-spaced cluster): exact fallback
                failed[i] = True
                fail_reason[i] = (
                    f"bracket-stall lo={lo[i]} hi={hi[i]} "
                    f"in_cnt={int(in_cnt[i])} n_min={int(n_min[i])} "
                    f"n_max={int(n_max[i])} bins={bs}"
                )
                continue
            lo[i], hi[i] = new_lo, new_hi
        if (done | failed).all():
            break
    pending = np.flatnonzero(~done)
    if len(pending):
        import sys

        for i in pending:
            print(
                "ribca_tpu quantile: exact-select fallback for channel "
                f"{int(i)}: "
                + fail_reason.get(int(i), "rounds exhausted"),
                file=sys.stderr,
            )
        if fallback is not None:
            for j, r in enumerate(ranks):
                fb_vals = fallback(r)
                for i in pending:
                    out[i, j] = fb_vals[i]
        else:
            out[pending] = _sort_fallback_channels(
                x, valid_h, valid_w, ranks, pending
            )
    return out


def _sort_fallback_channels(x, valid_h, valid_w, ranks, channels):
    """Exact sort fallback, one CHANNEL at a time (a full-stack masked
    sort is a >2x-stack-size HLO temp — observed RESOURCE_EXHAUSTED on
    the 12288²x7 whole slide next to its 4.26 GB prenorm cache); each
    pending channel sorts once and serves every rank."""

    @jax.jit
    def sorted_channel(ch):
        rows = jnp.arange(ch.shape[0])[:, None] < valid_h
        cols = jnp.arange(ch.shape[1])[None, :] < valid_w
        return jnp.sort(jnp.where(rows & cols, ch, jnp.nan).ravel())

    out = np.empty((len(channels), len(ranks)), np.float32)
    for row, i in enumerate(channels):
        s = sorted_channel(x[int(i)])
        for j, r in enumerate(ranks):
            out[row, j] = np.asarray(s[int(r)])
    return out


def _percentile_positions(amax: float, n_valid: int, counts_f32=None):
    """The floor/ceil ranks and interpolation weights of
    ``pinned_nanpercentile(ch, amax)`` for a channel with ``n_valid``
    valid values — the identical f32 scalar chain, op for op, on the
    host (every op is a single IEEE rounding, so numpy replicates the
    pinned device chain exactly)."""
    q = np.float32(np.float32(amax) / np.float32(100.0))
    counts = (np.float32(n_valid) if counts_f32 is None
              else np.float32(counts_f32))
    t = np.float32(q * np.float32(counts - np.float32(1.0)))
    low = np.floor(t)
    high = np.ceil(t)
    high_w = np.float32(t - low)
    low_w = np.float32(np.float32(1.0) - high_w)
    # clamp in EXACT integers (np.clip would promote the bound to f32,
    # where n-1 rounds back up to n beyond 2^24 valid pixels — the same
    # cliff the device-side integer clamp guards; ADVICE r3)
    low = min(max(int(low), 0), n_valid - 1)
    high = min(max(int(high), 0), n_valid - 1)
    return low, high, low_w, high_w


def exact_percentile(x, amax: float, n_valid: int, valid_h, valid_w,
                     ch_min=None, ch_max=None, counts_f32=None,
                     fallback=None):
    """np.float32 (C,) == pinned_nanpercentile(masked channel, amax),
    bitwise, computed with O(N) passes instead of a sort."""
    low, high, low_w, high_w = _percentile_positions(
        amax, n_valid, counts_f32=counts_f32
    )
    ranks = [low] if high == low else [low, high]
    vals = orderstats_select(x, ranks, n_valid, valid_h, valid_w,
                             ch_min=ch_min, ch_max=ch_max,
                             fallback=fallback)
    v_lo = vals[:, 0]
    v_hi = vals[:, -1]
    return _interp(v_lo, v_hi, low_w, high_w)


@jax.jit
def _interp_jit(v_lo, v_hi, high_w):
    return v_lo + (v_hi - v_lo) * high_w


def _interp(v_lo, v_hi, low_w, high_w):
    """pinned_nanpercentile's final lerp as ONE vectorized (C,) jit: the
    single-mul form has exactly one possible fma per lane, so the
    backend rounds each channel exactly as the scalar production stats
    graphs do (host numpy cannot replicate an fma in f32; see
    pinned_nanpercentile; bitwise equality with the sort path is pinned
    by test_quantile.py). One dispatch instead of C round trips."""
    del low_w
    return np.asarray(_interp_jit(
        jnp.asarray(v_lo, jnp.float32),
        jnp.asarray(v_hi, jnp.float32),
        jnp.float32(high_w),
    ), np.float32)


def exact_norm_stats(x, amax: float, n_valid: int, valid_h, valid_w):
    """(thresh, denom, scaled_min, has_signal) per channel — the identical
    quantities as ops.normalize.stats_from_pre_channel (steps 3-5 scalars
    of the reference normalize, preprocess.py:229-238), computed without
    the per-channel device sort. Returns np arrays (C,).
    """
    mx, mn, sig, cnt, cnt_i = (
        np.asarray(a) for a in _channel_extrema(x, valid_h, valid_w)
    )
    if not (cnt_i == n_valid).all():
        # interior NaNs (per-channel valid counts): ranks are no longer
        # shared across channels — defer to the per-channel sort path
        from ribca_tpu.ops.normalize import stats_from_pre_channel

        outs = []
        for i in range(x.shape[0]):
            rows = jnp.arange(x.shape[1])[:, None] < valid_h
            chm = jnp.where(rows, x[i], jnp.nan)
            outs.append(stats_from_pre_channel(chm, amax, valid_w=valid_w))
        return tuple(
            np.asarray([np.asarray(o[k]) for o in outs])
            for k in range(4)
        )
    low, high, low_w, high_w = _percentile_positions(amax, n_valid)
    ranks = [low] if high == low else [low, high]
    vals = orderstats_select(x, ranks, n_valid, valid_h, valid_w,
                             ch_min=mn, ch_max=mx)
    thresh = _interp(vals[:, 0], vals[:, -1], low_w, high_w)
    outs = [
        _finalize_one(
            x, jnp.int32(i), jnp.float32(thresh[i]), jnp.asarray(mn[i]),
            jnp.asarray(sig[i]), valid_h, valid_w,
        )
        for i in range(x.shape[0])
    ]
    denom, scaled_min = (
        np.asarray([o[k] for o in outs], np.float32) for k in range(2)
    )
    return thresh, denom, scaled_min, sig
