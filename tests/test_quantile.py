"""Bitwise parity of the histogram-refinement select (ops/quantile.py)
with the pinned-percentile sort path it replaces in the banded cache
pipeline (engine/tiled.prenorm_cached)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ribca_tpu.ops.normalize import (
    pinned_nanpercentile,
    stats_from_pre_channel,
)
from ribca_tpu.ops.quantile import (
    exact_norm_stats,
    exact_percentile,
    orderstats_select,
)


@functools.partial(jax.jit, static_argnames="amax")
def _pinned_ref(ch, amax):
    return pinned_nanpercentile(ch, amax)


def _masked(x, valid_h, valid_w):
    c, h, w = x.shape
    m = (np.arange(h)[:, None] < valid_h) & (np.arange(w)[None, :] < valid_w)
    out = np.where(m[None], x, np.nan).astype(np.float32)
    return out


def _cases():
    rng = np.random.default_rng(7)
    # (name, array CHW f32, valid_h, valid_w)
    uni = (rng.random((3, 61, 83)) * 3000).astype(np.float32)
    yield "uniform", uni, 61, 83
    yield "masked", uni, 47, 70
    q = np.floor(rng.random((2, 40, 50)) * 40).astype(np.float32)
    yield "heavy-duplicates", q, 40, 50
    z = np.zeros((2, 30, 30), np.float32)
    z[1] = 5.0
    yield "constant-channels", z, 30, 30
    two = np.where(rng.random((1, 64, 64)) < 0.5, 1.25, 7.5).astype(
        np.float32
    )
    yield "two-distinct", two, 64, 64
    tiny = (rng.random((2, 33, 57)) * 1e-6).astype(np.float32)
    yield "tiny-magnitudes", tiny, 33, 50
    ulp = np.float32(123.456) + np.float32(np.finfo(np.float32).eps * 128) * (
        rng.integers(0, 3, (1, 32, 32)).astype(np.float32)
    )
    yield "ulp-cluster", ulp.astype(np.float32), 32, 32


@pytest.mark.parametrize("amax", [90.0, 99.0, 99.7, 100.0, 10.0, 0.0])
def test_exact_percentile_bitwise(amax):
    for name, x, vh, vw in _cases():
        n = vh * vw
        if amax == 0.0 and n > 1:
            pass  # rank 0 path
        got = exact_percentile(jnp.asarray(x), amax, n, vh, vw)
        xm = _masked(x, vh, vw)
        # the pinned percentile: the chain every production normalize
        # path computes (ops/normalize.py)
        ref = np.asarray(
            [_pinned_ref(jnp.asarray(xm[i]), amax)
             for i in range(x.shape[0])], np.float32,
        )
        assert got.tobytes() == ref.tobytes(), (
            f"{name} amax={amax}: {got} != {ref}"
        )
        # and the pinned chain itself stays within an ulp of the unpinned
        # jnp.nanpercentile (same order statistics, same linear method)
        loose = np.asarray(
            [jnp.nanpercentile(jnp.asarray(xm[i]), amax)
             for i in range(x.shape[0])], np.float32,
        )
        np.testing.assert_allclose(ref, loose, rtol=3e-7)


def test_orderstats_match_sort():
    rng = np.random.default_rng(3)
    x = (rng.random((2, 37, 45)) * 100).astype(np.float32)
    x[:, :, 40:] = rng.random((2, 37, 5)).astype(np.float32)  # pad cols
    vh, vw = 37, 40
    n = vh * vw
    ranks = [0, 1, n // 3, n - 2, n - 1]
    got = orderstats_select(jnp.asarray(x), ranks, n, vh, vw)
    for i in range(2):
        srt = np.sort(x[i, :vh, :vw].ravel())
        np.testing.assert_array_equal(got[i], srt[ranks])


def test_exact_norm_stats_matches_sort_path():
    rng = np.random.default_rng(11)
    for amax in (99.0, 100.0, 50.0):
        x = (rng.random((3, 52, 66)) * 400).astype(np.float32)
        vh, vw = 52, 60
        # emulate the cache layout: NaN pad rows, duplicate pad cols
        x[:, :, vw:] = x[:, :, vw - 6 : vw][:, :, ::-1]
        x = np.concatenate([x, np.full((3, 4, 66), np.nan, np.float32)], 1)
        th, dn, sm, sg = exact_norm_stats(
            jnp.asarray(x), amax, vh * vw, vh, vw
        )
        for i in range(3):
            rth, rdn, rsm, rsg = stats_from_pre_channel(
                jnp.asarray(x[i, :vh]), amax, valid_w=vw
            )
            assert np.float32(th[i]).tobytes() == np.asarray(
                rth, np.float32).tobytes()
            assert np.float32(dn[i]).tobytes() == np.asarray(
                rdn, np.float32).tobytes()
            assert np.float32(sm[i]).tobytes() == np.asarray(
                rsm, np.float32).tobytes()
            assert bool(sg[i]) == bool(rsg)


def test_interior_nans_route_to_sort_path():
    rng = np.random.default_rng(5)
    x = (rng.random((2, 20, 20)) * 10).astype(np.float32)
    x[0, 3, 4] = np.nan  # interior NaN: per-channel counts diverge
    th, dn, sm, sg = exact_norm_stats(jnp.asarray(x), 99.0, 400, 20, 20)
    for i in range(2):
        rth, _, _, _ = stats_from_pre_channel(
            jnp.asarray(x[i]), 99.0, valid_w=20
        )
        assert np.float32(th[i]).tobytes() == np.asarray(
            rth, np.float32).tobytes()


def test_all_zero_channel_has_no_signal():
    x = np.zeros((1, 16, 16), np.float32)
    th, dn, sm, sg = exact_norm_stats(jnp.asarray(x), 99.0, 256, 16, 16)
    assert not bool(sg[0])
    assert sm[0] == np.float32(-1.0)


def test_amax100_beyond_f32_integer_precision():
    """ADVICE r3: with > 2^24 valid pixels and amax=100, f32
    ``counts - 1`` rounds back up to ``counts``; the integer rank clamp
    in pinned_nanpercentile must still gather the LAST valid value (the
    channel max), not the first NaN pad — and stay bitwise equal to the
    host-clamped select path."""
    n_h, n_w = 4097, 4096           # n = 2^24 + 4096 valid pixels
    n = n_h * n_w
    assert np.float32(n - 1) == np.float32(n)  # the precision cliff
    rng = np.random.default_rng(3)
    x = rng.random((1, n_h, n_w)).astype(np.float32) * 100.0
    true_max = np.float32(x.max())

    got = np.asarray(_pinned_ref(jnp.asarray(x[0]), 100.0))
    assert not np.isnan(got), "amax=100 gathered the NaN pad"
    assert got == true_max

    sel = exact_percentile(jnp.asarray(x), 100.0, n, n_h, n_w)
    np.testing.assert_array_equal(sel[0], got)


def test_blocked_select_round_matches_whole(monkeypatch):
    """The row-blocked refinement pass (whole-slide HBM guard — a
    full-stack round OOMed at 12288²x7, r4) merges to EXACTLY the
    whole-stack round's results, including overlap masking of the
    clamped last block and extrema multiplicities split across
    blocks."""
    from ribca_tpu.ops import quantile as q

    rng = np.random.default_rng(5)
    x = np.floor(rng.random((3, 101, 53)) * 50).astype(np.float32)
    xm = _masked(x, 97, 50)
    lo = np.full(3, 0.0, np.float32)
    hi = np.full(3, 50.0, np.float32)

    whole = [np.asarray(a) for a in q._select_round(
        jnp.asarray(xm), jnp.asarray(lo), jnp.asarray(hi), 97, 50,
        bins=q.SELECT_BINS,
    )]
    monkeypatch.setattr(q, "SELECT_BLOCK_ELEMS", 3 * 16 * 53)
    blocked = [np.asarray(a) for a in q._select_round_any(
        jnp.asarray(xm), jnp.asarray(lo), jnp.asarray(hi), 97, 50,
        bins=q.SELECT_BINS,
    )]
    for w, b, name in zip(whole, blocked,
                          ("hist", "c_less", "min", "max", "n_min",
                           "n_max", "cnt")):
        np.testing.assert_array_equal(w, b, err_msg=name)

    # end-to-end: the full select over the blocked rounds stays bitwise
    got = q.exact_percentile(jnp.asarray(xm), 99.8, 97 * 50, 97, 50)
    ref = np.asarray([
        np.asarray(_pinned_ref(jnp.asarray(xm[i]), 99.8))
        for i in range(3)
    ])
    np.testing.assert_array_equal(got, ref)


def test_ulp_dense_converges_without_fallback():
    """Regression (r4 whole-slide): with values packed below f32 ulp
    spacing the bracket refines to ulp scale, where nearest-rounding the
    f32 bracket edges could round the upper edge DOWN past the target —
    an empty [a, a) bracket, rank-slip, and a silent 45 s sort fallback
    on every channel. Directed edge rounding must converge with NO
    fallback and stay bitwise equal to the pinned sort."""
    from ribca_tpu.ops.quantile import exact_percentile

    rng = np.random.default_rng(9)
    # 200k values inside a 0.01-wide window at ~191: spacing ~5e-8,
    # f32 ulp at that magnitude ~1.5e-5 -> heavy ulp clustering
    vals = (191.0 + rng.random(200_000) * 0.01).astype(np.float32)
    x = vals.reshape(1, 400, 500)

    def no_fallback(rank):
        raise AssertionError("sort fallback triggered")

    for amax in (99.8, 97.3, 50.0):
        got = exact_percentile(jnp.asarray(x), amax, x[0].size, 400, 500,
                               fallback=no_fallback)
        ref = np.asarray(_pinned_ref(jnp.asarray(x[0]), amax))
        np.testing.assert_array_equal(got[0], ref)


def test_device_loop_matches_host(monkeypatch):
    """The single-dispatch device refinement loop (TPU production path)
    must return bitwise-identical order statistics to the host-driven
    loop on every case corpus entry — both ultimately converge to exact
    statistics, so any divergence is a walk bug."""
    from ribca_tpu.ops import quantile as q

    for name, x, vh, vw in _cases():
        xm = _masked(x, vh, vw)
        n = vh * vw
        for amax in (99.8, 50.0, 100.0):
            monkeypatch.setenv("RIBCA_SELECT_DEVICE_LOOP", "0")
            host = q.exact_percentile(jnp.asarray(xm), amax, n, vh, vw)
            monkeypatch.setenv("RIBCA_SELECT_DEVICE_LOOP", "1")
            dev = q.exact_percentile(jnp.asarray(xm), amax, n, vh, vw)
            np.testing.assert_array_equal(
                dev, host, err_msg=f"{name} amax={amax}"
            )


def test_device_loop_channel_chunking_matches(monkeypatch):
    """The HBM guard that splits the one-dispatch loop into channel
    chunks (the 16384²x7 OOM fix) must be invisible in the results:
    forcing 1-channel chunks on the corpus returns bitwise-identical
    statistics to the full-C dispatch."""
    from ribca_tpu.ops import quantile as q

    monkeypatch.setenv("RIBCA_SELECT_DEVICE_LOOP", "1")
    full = {}
    for name, x, vh, vw in _cases():
        xm = _masked(x, vh, vw)
        full[name] = q.exact_percentile(
            jnp.asarray(xm), 99.8, vh * vw, vh, vw
        )
    monkeypatch.setattr(q, "SELECT_LOOP_SLAB_MAX", 0)
    monkeypatch.setattr(q, "SELECT_LOOP_CHUNK_BYTES", 1)  # 1 ch/chunk
    for name, x, vh, vw in _cases():
        xm = _masked(x, vh, vw)
        chunked = q.exact_percentile(
            jnp.asarray(xm), 99.8, vh * vw, vh, vw
        )
        np.testing.assert_array_equal(chunked, full[name], err_msg=name)


def test_device_loop_ulp_dense(monkeypatch):
    """Ulp-dense convergence through the device loop (same corpus as
    the host-loop regression; the f32 outward-rounded edges must not
    reintroduce the empty-bracket collapse)."""
    from ribca_tpu.ops.quantile import exact_percentile

    monkeypatch.setenv("RIBCA_SELECT_DEVICE_LOOP", "1")
    rng = np.random.default_rng(9)
    vals = (191.0 + rng.random(200_000) * 0.01).astype(np.float32)
    x = vals.reshape(1, 400, 500)

    def no_fallback(rank):
        raise AssertionError("sort fallback triggered")

    for amax in (99.8, 97.3, 50.0):
        got = exact_percentile(jnp.asarray(x), amax, x[0].size, 400, 500,
                               fallback=no_fallback)
        ref = np.asarray(_pinned_ref(jnp.asarray(x[0]), amax))
        np.testing.assert_array_equal(got[0], ref)
