"""Edge cases: empty masks, sparse/non-contiguous cell ids, single-cell
images — the places padded static-shape pipelines typically break."""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.engine.ensemble import EnsembleRunner
from ribca_tpu.engine.pipeline import run_image
from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.parallel.mesh import get_mesh
from ribca_tpu.utils.config import AnnotatorConfig


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    p = MarkerParser(strict=True)
    mf = tmp_path_factory.mktemp("mk") / "m.txt"
    mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
    p.parse(str(mf))
    return EnsembleRunner(
        p, ModelRegistry(str(tmp_path_factory.mktemp("none"))),
        n_channels=7, infer=False, dtype=jnp.float32, mesh=get_mesh(),
    )


def test_empty_mask(runner, rng):
    img = rng.uniform(0, 200, size=(7, 70, 80)).astype(np.float32)
    mask = np.zeros((70, 80), np.int32)
    rec = run_image(img, mask, AnnotatorConfig(), runner)
    assert rec.n_cells == 0
    assert rec.intensity_full.shape[0] == 0


def test_empty_probs_merge():
    labels, conf = merge_by_voting(
        PanelProbs("immune_base", np.zeros((0, 5), np.float32)),
        None, None, 0.3, {n: -1 for n in ("Others",)},
    )
    assert labels == [] and conf.shape == (0,)


def test_sparse_cell_ids(runner, rng):
    """ids {7, 100, 4095} — far apart, non-contiguous."""
    img = rng.uniform(0, 200, size=(7, 90, 90)).astype(np.float32)
    mask = np.zeros((90, 90), np.int32)
    mask[10:18, 10:18] = 7
    mask[40:48, 40:48] = 100
    mask[70:78, 70:78] = 4095
    rec = run_image(img, mask, AnnotatorConfig(), runner)
    np.testing.assert_array_equal(rec.cell_ids, [7, 100, 4095])
    assert rec.panel_probs["immune_base"].shape == (3, 5)
    # centroid sanity
    assert 10 <= rec.mean_row[0] <= 18
    assert 70 <= rec.mean_col[2] <= 78


def test_single_cell(runner, rng):
    img = rng.uniform(0, 200, size=(7, 50, 50)).astype(np.float32)
    mask = np.zeros((50, 50), np.int32)
    mask[20:30, 20:30] = 1
    rec = run_image(img, mask, AnnotatorConfig(), runner)
    assert rec.n_cells == 1
    np.testing.assert_allclose(
        rec.panel_probs["immune_base"].sum(axis=1), 1.0, atol=1e-5
    )


def test_cell_touching_borders(runner, rng):
    """Cells whose windows clamp at every image edge (utils.py:227-240)."""
    img = rng.uniform(0, 200, size=(7, 60, 60)).astype(np.float32)
    mask = np.zeros((60, 60), np.int32)
    mask[0:6, 0:6] = 1        # top-left corner
    mask[54:60, 54:60] = 2    # bottom-right corner
    mask[0:6, 27:33] = 3      # top edge
    rec = run_image(img, mask, AnnotatorConfig(), runner)
    assert rec.n_cells == 3
    assert np.all(np.isfinite(rec.panel_probs["immune_base"]))
    assert np.all(np.isfinite(rec.intensity_full))
