"""Cohort dispatch packing (engine/packer.py, VERDICT r1 "next" #9).

Tail cells of many images share full ensemble dispatches; results must be
identical to per-image runs while the padded-row fraction drops."""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.engine.ensemble import EnsembleRunner
from ribca_tpu.engine.packer import CohortPacker
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
def cohort():
    images = []
    for i, n_cells in enumerate([23, 17, 29]):
        mask, _ = make_cells(h=120, w=110, n_cells=n_cells, seed=20 + i)
        images.append((make_image(mask, n_channels=7, seed=20 + i), mask))
    return images


def _run_cohort(images, cfg, runner, pack):
    packer = CohortPacker(runner, pack, 7, prefetch_depth=2)
    records = [
        run_image(img, mask, cfg, runner, packer=packer)
        for img, mask in images
    ]
    packer.finalize()
    return records, packer


def test_packed_matches_individual(runner, cohort):
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8)
    solo = [run_image(img, mask, cfg, runner) for img, mask in cohort]
    n_dev = get_mesh().size
    # pack smaller than every image's cell count -> forces buffer flushes
    # and at least one straddled segment split
    pack = max(16, n_dev)
    packed, packer = _run_cohort(cohort, cfg, runner, pack)
    assert packer.dispatched_rows > 0
    for a, b in zip(solo, packed):
        np.testing.assert_array_equal(a.cell_ids, b.cell_ids)
        np.testing.assert_allclose(
            a.panel_probs["immune_base"], b.panel_probs["immune_base"],
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.argmax(a.panel_probs["immune_base"], 1),
            np.argmax(b.panel_probs["immune_base"], 1),
        )
        np.testing.assert_allclose(a.intensity_full, b.intensity_full,
                                   atol=1e-6)


def test_packing_reduces_padding(runner, cohort):
    """Three images whose tails all bucket to the pack size: per-image
    dispatch pads each tail; the shared packer pads once."""
    cfg = AnnotatorConfig(normalize=False)
    n_dev = get_mesh().size
    pack = max(64, n_dev)

    solo_rows = 0
    for img, mask in cohort:
        _, p = _run_cohort([(img, mask)], cfg, runner, pack)
        solo_rows += p.dispatched_rows
    _, shared = _run_cohort(cohort, cfg, runner, pack)
    assert shared.dispatched_rows < solo_rows
    assert shared.pad_fraction < 1.0 - (
        shared.valid_rows / max(solo_rows, 1)
    ) + 1e-9


def test_packer_with_tiled_path(runner):
    """Banded pieces submit with explicit (non-contiguous) row indices."""
    mask, _ = make_cells(h=420, w=90, n_cells=24, seed=1)
    img = make_image(mask, n_channels=7, seed=1)
    cfg = AnnotatorConfig(normalize=False, canonical_shapes=False)
    whole = run_image(img, mask, cfg, runner)
    packer = CohortPacker(runner, max(16, get_mesh().size), 7)
    tiled = run_image_tiled(img, mask, cfg, runner, band_rows=160,
                            packer=packer)
    packer.finalize()
    np.testing.assert_array_equal(whole.cell_ids, tiled.cell_ids)
    np.testing.assert_allclose(
        whole.panel_probs["immune_base"], tiled.panel_probs["immune_base"],
        atol=1e-6,
    )


def test_empty_image_in_cohort(runner, cohort):
    cfg = AnnotatorConfig(normalize=False)
    empty_mask = np.zeros((64, 64), np.int32)
    empty_img = np.zeros((7, 64, 64), np.uint16)
    images = [cohort[0], (empty_img, empty_mask), cohort[1]]
    packed, _ = _run_cohort(images, cfg, runner, max(64, get_mesh().size))
    assert packed[1].n_cells == 0
    assert packed[1].panel_probs["immune_base"].shape == (0, 5)
    assert packed[0].n_cells == 23 and packed[2].n_cells == 17
