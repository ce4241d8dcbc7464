"""Banded whole-slide pipeline vs the single-shot path.

normalize=False is bit-exact. normalize=True has two modes: the
single-upload cache mode (prenorm kept in HBM, EXACT jnp.percentile
stats — bit-identical to single-shot) and the two-pass histogram fallback
for slides beyond the cache budget (percentile approximated; tolerance
asserted tight) — SURVEY §7 "Hard parts: percentile + data-dependent
control flow".
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.engine.ensemble import EnsembleRunner
from ribca_tpu.engine.pipeline import run_image
from ribca_tpu.engine.tiled import run_image_tiled
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.parallel.mesh import get_mesh
from ribca_tpu.utils.config import AnnotatorConfig
from tests.synth import make_cells, make_image


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    p = MarkerParser(strict=True)
    mf = tmp_path_factory.mktemp("mk") / "markers.txt"
    mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
    p.parse(str(mf))
    registry = ModelRegistry(str(tmp_path_factory.mktemp("empty")))
    return EnsembleRunner(p, registry, n_channels=7, infer=False,
                          dtype=jnp.float32, mesh=get_mesh())


@pytest.fixture(scope="module")
def fixture():
    mask, _ = make_cells(h=420, w=90, n_cells=24, seed=1)
    img = make_image(mask, n_channels=7, seed=1)
    return img, mask


def test_tiled_matches_single_shot_no_normalize(runner, fixture):
    img, mask = fixture
    cfg = AnnotatorConfig(normalize=False, canonical_shapes=False)
    whole = run_image(img, mask, cfg, runner)
    tiled = run_image_tiled(img, mask, cfg, runner, band_rows=160)
    np.testing.assert_array_equal(whole.cell_ids, tiled.cell_ids)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        whole.intensity_full, tiled.intensity_full, atol=1e-6
    )


def test_tiled_matches_single_shot_normalized_histogram(runner, fixture):
    """Two-pass histogram fallback (cache budget forced to 0)."""
    img, mask = fixture
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                          device_prenorm_cache_bytes=0,
                          canonical_shapes=False)
    whole = run_image(img, mask, cfg, runner)
    tiled = run_image_tiled(img, mask, cfg, runner, band_rows=160)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=2e-3,
    )
    # labels (argmax) must agree everywhere
    np.testing.assert_array_equal(
        np.argmax(whole.panel_probs["immune_base"], 1),
        np.argmax(tiled.panel_probs["immune_base"], 1),
    )
    np.testing.assert_allclose(
        whole.intensity_full, tiled.intensity_full, atol=2e-3
    )


class CountingReader:
    """ndarray-quacking wrapper that records which rows were decoded —
    proves the cache mode reads and uploads each pixel exactly once."""

    def __init__(self, arr):
        self._arr = arr
        self.shape = arr.shape
        self.dtype = arr.dtype
        self.nbytes = arr.nbytes
        self.rows_read = np.zeros(arr.shape[1], np.int32)

    def read_band(self, lo, hi):
        self.rows_read[lo:hi] += 1
        return self._arr[:, lo:hi]

    def __getitem__(self, key):
        chans, rows = key
        assert chans == slice(None)
        lo = rows.start or 0
        hi = rows.stop if rows.stop is not None else self.shape[1]
        return self.read_band(lo, hi)

    def channel_min(self):
        return self._arr.reshape(self.shape[0], -1).min(1).astype(
            np.float32
        )


def test_tiled_cache_mode_bit_exact(runner, fixture):
    """Single-upload cache mode must reproduce single-shot EXACTLY (no
    histogram approximation) while decoding every row exactly once."""
    img, mask = fixture
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                          canonical_shapes=False)
    from ribca_tpu.engine.tiled import prenorm_cache_budget

    assert img.size * 4 <= prenorm_cache_budget(cfg, runner.mesh)
    whole = run_image(img, mask, cfg, runner)
    reader = CountingReader(img)
    tiled = run_image_tiled(reader, mask, cfg, runner, band_rows=160)
    np.testing.assert_array_equal(whole.cell_ids, tiled.cell_ids)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=1e-6, rtol=1e-6,
    )
    np.testing.assert_allclose(
        whole.intensity_full, tiled.intensity_full, atol=1e-6
    )
    # one decode per row, pass B reads nothing
    np.testing.assert_array_equal(
        reader.rows_read, np.ones(img.shape[1], np.int32)
    )


def test_tiled_canonical_width_cache_mode_exact(runner, fixture):
    """Width-canonicalized banded cache mode (default config) matches the
    non-canonical single-shot run: symmetric column pads + masked stats
    (VERDICT r2 missing #5 / ROADMAP 6c)."""
    img, mask = fixture
    whole = run_image(
        img, mask,
        AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                        canonical_shapes=False),
        runner,
    )
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8)
    tiled = run_image_tiled(img, mask, cfg, runner, band_rows=160)
    np.testing.assert_array_equal(whole.cell_ids, tiled.cell_ids)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=1e-6, rtol=1e-6,
    )
    np.testing.assert_allclose(
        whole.intensity_full, tiled.intensity_full, atol=1e-6
    )


def test_tiled_canonical_width_histogram_mode(runner, fixture):
    """Two-pass histogram flow with canonical width: masked histogram
    keeps the percentile exact w.r.t. the true pixels."""
    img, mask = fixture
    whole = run_image(
        img, mask,
        AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                        canonical_shapes=False),
        runner,
    )
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                          device_prenorm_cache_bytes=0)
    tiled = run_image_tiled(img, mask, cfg, runner, band_rows=160)
    np.testing.assert_array_equal(
        np.argmax(whole.panel_probs["immune_base"], 1),
        np.argmax(tiled.panel_probs["immune_base"], 1),
    )
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=2e-3,
    )


def test_tiled_canonical_width_shares_programs(runner, fixture):
    """A second slide with a different WIDTH in the same canonical bucket
    compiles ZERO new programs — the point of width canonicalization.
    (Different heights still regenerate a few tiny eager glue ops —
    concat/slice shapes around the tail band — but share every expensive
    program: prenorm, stats, extraction, ensemble.)"""
    from ribca_tpu.utils import logging as rlog

    img, mask = fixture
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8)
    rlog._ensure_compile_listener()
    # slide A warms every band program for the (band_rows=160, bucket)
    run_image_tiled(img, mask, cfg, runner, band_rows=160)
    mask2, _ = make_cells(h=420, w=110, n_cells=24, seed=2)
    img2 = make_image(mask2, n_channels=7, seed=2)
    before = dict(rlog._COMPILES)
    rec = run_image_tiled(img2, mask2, cfg, runner, band_rows=160)
    assert rec.n_cells == 24
    assert rlog._COMPILES["count"] == before["count"], (
        "different slide width in the same bucket recompiled"
    )


def test_auto_dispatch_by_budget(runner, fixture):
    """run_image must route big images through the banded path."""
    img, mask = fixture
    cfg = AnnotatorConfig(
        normalize=False, device_image_budget_bytes=img.nbytes // 4
    )
    rec = run_image(img, mask, cfg, runner)
    assert rec.n_cells == 24
    cfg2 = AnnotatorConfig(normalize=False)
    whole = run_image(img, mask, cfg2, runner)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], rec.panel_probs["immune_base"],
        atol=1e-6,
    )


def test_prenorm_cache_budget_resolution(runner):
    """Explicit budgets pass through; -1 auto-sizes from memory_stats
    and falls back to 4 GB on backends without them."""
    from ribca_tpu.engine.tiled import (
        PRENORM_CACHE_FREE_FRACTION,
        prenorm_cache_budget,
    )

    class Cfg:
        device_prenorm_cache_bytes = 123

    assert prenorm_cache_budget(Cfg(), runner.mesh) == 123

    class Auto:
        device_prenorm_cache_bytes = -1

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30, "bytes_in_use": 6 << 30}

    class FakeMesh:
        devices = np.array([FakeDev()], dtype=object)

    assert prenorm_cache_budget(Auto(), FakeMesh()) == int(
        (10 << 30) * PRENORM_CACHE_FREE_FRACTION
    )

    class NoStatsDev:
        def memory_stats(self):
            raise NotImplementedError

    class NoStatsMesh:
        devices = np.array([NoStatsDev()], dtype=object)

    assert prenorm_cache_budget(Auto(), NoStatsMesh()) == 4 << 30


def test_prenorm_cache_budget_tpu_kind_fallback():
    """Tunneled TPUs report memory_stats()=None; the budget then comes
    from the device kind's known HBM size."""
    from ribca_tpu.engine.tiled import (
        PRENORM_CACHE_TOTAL_FRACTION,
        prenorm_cache_budget,
    )

    class Auto:
        device_prenorm_cache_bytes = -1

    class V5e:
        platform = "tpu"
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            return None

    class FakeMesh:
        devices = np.array([V5e()], dtype=object)

    assert prenorm_cache_budget(Auto(), FakeMesh()) == int(
        (16 << 30) * PRENORM_CACHE_TOTAL_FRACTION
    )


def test_band_width_canonicalization_shares_programs(runner):
    """VERDICT r3 #6 done-criterion: a second banded slide of a DIFFERENT
    true width (same canonical bucket) compiles ZERO new programs — the
    band programs are keyed on the bucketed width (engine/tiled._pad_cols
    + band_width), so heterogeneous scanner geometry shares one set."""
    from ribca_tpu.engine.tiled import band_width
    from ribca_tpu.utils import logging as rlog

    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                          canonical_shapes=True)
    assert band_width(90, cfg) == band_width(70, cfg)  # same bucket

    mask1, _ = make_cells(h=420, w=90, n_cells=24, seed=3)
    img1 = make_image(mask1, n_channels=7, seed=3)
    mask2, _ = make_cells(h=420, w=70, n_cells=24, seed=4)
    img2 = make_image(mask2, n_channels=7, seed=4)

    run_image_tiled(img1, mask1, cfg, runner, band_rows=160)  # warm
    rlog._ensure_compile_listener()
    c0 = dict(rlog._COMPILES)
    rec = run_image_tiled(img2, mask2, cfg, runner, band_rows=160)
    compiled = rlog._COMPILES["count"] - c0["count"]
    assert compiled == 0, (
        f"width 70 after width 90 compiled {compiled} new programs"
    )
    assert rec.n_cells == 24


def test_stats_route_by_scale(runner, fixture, monkeypatch):
    """prenorm_cached routes its exact stats by per-channel pixel count:
    below SELECT_STATS_MIN_PIXELS the per-channel sort wins (the select
    pays ~5 host-driven rounds of tunnel round trips — measured 5 s vs
    0.5 s at 3000²x7), above it the select wins (45 s sort at 12288²x7).
    Both are bitwise identical; this pins WHICH path runs."""
    from ribca_tpu.engine import tiled as tl
    from ribca_tpu.ops import quantile as q

    img, mask = fixture
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8,
                          canonical_shapes=False)

    calls = []
    real = q.exact_norm_stats
    monkeypatch.setattr(
        q, "exact_norm_stats",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    # small slide (420x90 << 32M px): sort path, select never invoked
    tl.prenorm_cached(img, cfg, band_rows=160)
    assert not calls
    # forced-low threshold: the select path engages
    monkeypatch.setattr(tl, "SELECT_STATS_MIN_PIXELS", 0)
    out_sel = tl.prenorm_cached(img, cfg, band_rows=160)
    assert calls
    out_sort = None
    monkeypatch.setattr(tl, "SELECT_STATS_MIN_PIXELS", 1 << 60)
    out_sort = tl.prenorm_cached(img, cfg, band_rows=160)
    for a, b in zip(out_sel[1:], out_sort[1:]):  # thresh/denom/min/signal
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
