"""Multi-head Annotator e2e: structure + nerve panels through the full
API — exercises the struct+nerve merge branch (model.py:538-566) and the
two-head ensemble program end to end."""

import os

import numpy as np
import pytest

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.utils.config import AnnotatorConfig
from tests.synth import write_fixture

# structure panel + GFAP completes nerve_cell (DAPI, CD45, GFAP)
MARKERS = ["DAPI", "aSMA", "CD31", "PanCK", "Vimentin", "Ki67", "CD45",
           "GFAP"]
N_CELLS = 8


@pytest.fixture(scope="module")
def ann(tmp_path_factory):
    wd = tmp_path_factory.mktemp("mh")
    img_path, mask_path, _, _ = write_fixture(
        wd, n_channels=len(MARKERS), n_cells=N_CELLS, h=80, w=90
    )
    mf = wd / "markers.txt"
    mf.write_text("\n".join(MARKERS) + "\n")
    csv = str(wd / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    a = Annotator(
        AnnotatorConfig(
            marker_file=str(mf), csv_file=csv, main_dir=str(wd),
            batch_id="mh", infer=False, dtype="float32",
            device_voting=False,
        ),
        models_dir=str(wd / "none"),
    )
    a.preprocess()
    a.predict()
    return a


def test_both_heads_ran(ann):
    assert ann.channel_parser.struct and ann.channel_parser.nerve
    assert not ann.channel_parser.immune_base
    rec = ann.records[0]
    assert set(rec.panel_probs) == {"structure", "nerve_cell"}
    assert rec.panel_probs["structure"].shape == (N_CELLS, 6)
    assert rec.panel_probs["nerve_cell"].shape == (N_CELLS, 2)


def test_merge_used_struct_nerve_branch(ann):
    rec = ann.records[0]
    labels, conf = merge_by_voting(
        None,
        PanelProbs("structure", rec.panel_probs["structure"]),
        PanelProbs("nerve_cell", rec.panel_probs["nerve_cell"]),
        ann.confidence_thresh, ann.cell_type_confidence,
    )
    assert ann.annotations[0] == labels
    np.testing.assert_allclose(ann.confidence[0], conf)


def test_outputs_flow(ann):
    ann.generate_heatmap(integrate=True)
    ann.export_annotations()
    ann.colorize(from_script=True)
    rd = ann.result_dir
    assert os.path.exists(os.path.join(rd, "mh_annotation_0.csv"))
    assert os.path.exists(os.path.join(rd, "mh_colorized_annotation_0.png"))
