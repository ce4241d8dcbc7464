"""End-to-end annotation parity vs a reference-equivalent torch pipeline.

The strongest correctness statement the suite makes: a miniature
re-implementation of the reference's full single-panel flow — oracle
normalization (preprocess.py:214-239), oracle crop/soft-mask/resize
(utils.py:226-270, preprocess.py:106), torch ViT forward + softmax
(model.py:397-406), dict-based single-panel merge (model.py:583-607) —
run with the SAME weights (a real torch ``.pth`` checkpoint converted by
the registry) must produce byte-identical labels and matching confidences
and intensities to the full ribca_tpu Annotator in f32 mode.
"""

import os

import numpy as np
import pytest
import torch

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.panels.vocab import PANELS, PANEL_CLASS_MAPS
from ribca_tpu.utils.config import AnnotatorConfig
from tests.oracle import (
    cell_pos_dict,
    oracle_channel_select,
    oracle_crop_cell,
    oracle_normalize,
    oracle_resize,
)
from tests.synth import write_fixture
from tests.torch_mirror import TorchViT

BLUR = 0.3
AMAX = 99.8
CONF = 0.3


def reference_pipeline(img, mask, channel_index, model):
    """The reference's preprocess->predict->merge flow for one image,
    immune_base panel only."""
    norm = oracle_normalize(img.astype(np.float32), blur=BLUR, amax=AMAX)
    min_val = norm.min(axis=(1, 2), keepdims=True)
    img_zero = norm - min_val
    pos = cell_pos_dict(mask)

    patches, intensities = [], []
    for cid in sorted(pos):
        patch, avg = oracle_crop_cell(img_zero, mask, min_val, cid, pos, 40)
        patch = oracle_resize(patch, 40)
        patches.append(oracle_channel_select(patch, channel_index))
        intensities.append(avg)
    x = torch.tensor(np.stack(patches), dtype=torch.float32)
    with torch.no_grad():
        probs = torch.softmax(model(x), dim=1).numpy()

    cmap = PANEL_CLASS_MAPS["immune_base"]
    labels, confs = [], []
    for row in probs:
        pred = {cmap[i]: np.float32(row[i]) for i in range(len(cmap))}
        best = max(pred, key=pred.get)
        if best != "Others" and pred[best] < CONF:
            labels.append("Others")
            confs.append(-1.0)
        else:
            labels.append(best)
            confs.append(float(pred[best]))
    intensity = (np.stack(intensities) + 1.0) / 2.0
    return labels, np.asarray(confs, np.float32), intensity, probs


@pytest.mark.parametrize("seed", [0])
def test_full_pipeline_matches_reference_equivalent(tmp_path, seed):
    img_path, mask_path, mask, img = write_fixture(
        tmp_path, n_channels=7, n_cells=9, h=90, w=100, seed=seed
    )
    markers = PANELS["immune_base"]
    marker_file = tmp_path / "markers.txt"
    marker_file.write_text("\n".join(markers) + "\n")

    # one real torch checkpoint, shared by both pipelines
    torch.manual_seed(3)
    tm = TorchViT(in_chans=7, num_classes=5, dim=288)
    tm.eval()
    models_dir = tmp_path / "models"
    models_dir.mkdir()
    torch.save({"model": tm.state_dict()}, str(models_dir / "immune_base.pth"))

    main_dir = tmp_path / "main"
    main_dir.mkdir()
    csv = str(main_dir / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    ann = Annotator(
        AnnotatorConfig(
            marker_file=str(marker_file), csv_file=csv,
            main_dir=str(main_dir), batch_id="p", infer=False,
            dtype="float32", blur=BLUR, upper_limit=AMAX, confidence=CONF,
            device_voting=False,
        ),
        models_dir=str(models_dir),
    )
    ann.preprocess()
    ann.predict()

    channel_index = ann.channel_parser.indices["immune_base"]
    ref_labels, ref_conf, ref_int, ref_probs = reference_pipeline(
        img, mask, channel_index, tm
    )

    got_probs = ann.records[0].panel_probs["immune_base"]
    np.testing.assert_allclose(got_probs, ref_probs, atol=5e-3,
                               err_msg="softmax probabilities diverge")
    assert ann.annotations[0] == ref_labels
    np.testing.assert_allclose(ann.confidence[0], ref_conf, atol=5e-3)
    np.testing.assert_allclose(
        ann.records[0].intensity_full, ref_int, atol=1e-4
    )
