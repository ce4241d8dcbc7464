"""Ensemble runner + pipeline: head selection, shapes, sharding,
imputation path, and chunk equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.engine.ensemble import EnsembleRunner, prediction_panels
from ribca_tpu.engine.pipeline import chunk_size_for, run_image
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.parallel.mesh import get_mesh
from ribca_tpu.utils.config import AnnotatorConfig
from tests.synth import make_cells, make_image


def parser_for(tmp_marker_file, markers, strict=True):
    p = MarkerParser(strict=strict)
    p.parse(tmp_marker_file(markers))
    return p


def test_prediction_panels_priority(tmp_marker_file):
    # all markers of every panel -> immune_full wins; extended/base dropped
    markers = sorted({m for v in PANELS.values() for m in v})
    p = parser_for(tmp_marker_file, markers)
    panels = prediction_panels(p)
    assert panels == ["immune_full", "structure", "nerve_cell"]

    p2 = parser_for(tmp_marker_file, PANELS["immune_base"])
    assert prediction_panels(p2) == ["immune_base"]


def test_chunk_size_buckets():
    assert chunk_size_for(10, 65536, 8) == 64
    assert chunk_size_for(100, 65536, 8) == 128
    assert chunk_size_for(70000, 65536, 8) == 65536
    assert chunk_size_for(300, 65536, 7) == 518  # multiple of 7


@pytest.fixture(scope="module")
def base_runner(tmp_path_factory):
    """immune_base runner with deterministic random weights."""
    p = MarkerParser(strict=True)
    mf = tmp_path_factory.mktemp("mk") / "markers.txt"
    mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
    p.parse(str(mf))
    registry = ModelRegistry(str(tmp_path_factory.mktemp("empty")))
    return EnsembleRunner(p, registry, n_channels=7, infer=False,
                         dtype=jnp.float32, mesh=get_mesh())


def test_runner_probs_shape_and_normalization(base_runner, rng):
    n = get_mesh().size * 8
    patches = rng.normal(size=(n, 7, 40, 40)).astype(np.float32)
    probs = base_runner.run_chunk(jnp.asarray(patches))
    assert set(probs) == {"immune_base"}
    arr = np.asarray(probs["immune_base"])
    assert arr.shape == (n, 5)
    np.testing.assert_allclose(arr.sum(axis=1), 1.0, atol=1e-5)
    assert np.all(arr >= 0)


def test_runner_batch_invariance(base_runner, rng):
    """Same cell -> same probs regardless of chunk composition."""
    n = get_mesh().size * 8
    patches = rng.normal(size=(n, 7, 40, 40)).astype(np.float32)
    full = np.asarray(base_runner.run_chunk(jnp.asarray(patches))["immune_base"])
    shuffled = np.concatenate([patches[n // 2:], patches[: n // 2]])
    part = np.asarray(
        base_runner.run_chunk(jnp.asarray(shuffled))["immune_base"]
    )
    np.testing.assert_allclose(
        full, np.concatenate([part[n // 2:], part[: n // 2]]), atol=2e-5
    )


def test_run_image_end_to_end(base_runner):
    mask, _ = make_cells(h=80, w=90, n_cells=8)
    img = make_image(mask, n_channels=7)
    cfg = AnnotatorConfig(normalize=True, blur=0.3, upper_limit=99.8)
    rec = run_image(img, mask, cfg, base_runner)
    assert rec.n_cells == 8
    assert rec.intensity_full.shape == (8, 7)
    assert rec.panel_probs["immune_base"].shape == (8, 5)
    assert np.all(rec.cell_ids == np.arange(1, 9))
    # centroids are inside the image
    assert np.all(rec.mean_row >= 0) and np.all(rec.mean_row < 80)
    # intensity rescaled to [0, 1]
    assert rec.intensity_full.min() >= 0 and rec.intensity_full.max() <= 1


def test_run_image_multi_chunk_equivalence(base_runner):
    """Results identical whether cells fit one chunk or stream in many."""
    mask, _ = make_cells(h=100, w=110, n_cells=10)
    img = make_image(mask, n_channels=7)
    cfg_one = AnnotatorConfig(chunk_cells=65536)
    cfg_many = AnnotatorConfig(chunk_cells=1)  # -> chunk 64.. still one
    rec1 = run_image(img, mask, cfg_one, base_runner)
    rec2 = run_image(img, mask, cfg_many, base_runner)
    np.testing.assert_allclose(
        rec1.panel_probs["immune_base"], rec2.panel_probs["immune_base"],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        rec1.intensity_full, rec2.intensity_full, atol=1e-6
    )


def test_imputation_path_shapes(tmp_marker_file, tmp_path, rng):
    """immune_base with one missing marker + infer -> MAE fills the blank
    channel inside the fused program; probs still normalized."""
    markers = [m for m in PANELS["immune_base"] if m != "CD11c"]
    p = parser_for(tmp_marker_file, markers, strict=False)
    assert p.immune_base and p.indices["immune_base"].count(-1) == 1
    registry = ModelRegistry(str(tmp_path))
    runner = EnsembleRunner(p, registry, n_channels=len(markers),
                            infer=True, dtype=jnp.float32, mesh=get_mesh())
    assert runner.specs[0].imputer is not None
    n = get_mesh().size * 2
    patches = rng.normal(size=(n, len(markers), 40, 40)).astype(np.float32)
    probs = runner.run_chunk(jnp.asarray(patches))
    arr = np.asarray(probs["immune_base"])
    assert arr.shape == (n, 5)
    np.testing.assert_allclose(arr.sum(axis=1), 1.0, atol=1e-5)


def test_device_params_shared_across_runners(tmp_path):
    """Two Annotator-equivalent runners over the SAME weights dir share
    one cast+uploaded device param tree (per-job re-upload eliminated);
    replacing the checkpoint file on disk invalidates the cache."""
    import os
    import time

    import jax

    from ribca_tpu.models.calibrate import panel_signatures  # noqa: F401
    from ribca_tpu.models.train import TrainConfig, Trainer

    # write a real npz so the registry fingerprints a file (random-weight
    # fallbacks share too, but the file path is the production case)
    d = str(tmp_path)
    trainer = Trainer("immune_base", TrainConfig(seed=0), mesh=get_mesh())
    npz = os.path.join(d, "immune_base.npz")
    trainer.save(npz)

    def make_runner():
        p = MarkerParser(strict=True)
        mf = tmp_path / "markers.txt"
        mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
        p.parse(str(mf))
        return EnsembleRunner(p, ModelRegistry(d), n_channels=7,
                              infer=False, dtype=jnp.float32,
                              mesh=get_mesh())

    r1, r2 = make_runner(), make_runner()
    assert r1 is not r2 and r1._weights_key == r2._weights_key
    p1, _ = r1._params_on_device()
    p2, _ = r2._params_on_device()
    l1 = jax.tree_util.tree_leaves(p1)[0]
    l2 = jax.tree_util.tree_leaves(p2)[0]
    assert l1 is l2  # the same device buffer, not a re-upload

    # touch the file -> new fingerprint -> fresh upload
    t = time.time() + 2
    os.utime(npz, (t, t))
    r3 = make_runner()
    assert r3._weights_key != r1._weights_key
    p3, _ = r3._params_on_device()
    l3 = jax.tree_util.tree_leaves(p3)[0]
    assert l3 is not l1
