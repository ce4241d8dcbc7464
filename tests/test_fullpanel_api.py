"""Flagship path e2e: all five panels matched -> immune_full + structure
+ nerve heads, branch-1 vote merge (model.py:483-507) through the API."""

import numpy as np
import pytest

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.utils.config import AnnotatorConfig
from tests.synth import write_fixture

MARKERS = sorted({m for v in PANELS.values() for m in v})
N_CELLS = 6


@pytest.fixture(scope="module")
def ann(tmp_path_factory):
    wd = tmp_path_factory.mktemp("fp")
    img_path, mask_path, _, _ = write_fixture(
        wd, n_channels=len(MARKERS), n_cells=N_CELLS, h=70, w=80
    )
    mf = wd / "markers.txt"
    mf.write_text("\n".join(MARKERS) + "\n")
    csv = str(wd / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    a = Annotator(
        AnnotatorConfig(
            marker_file=str(mf), csv_file=csv, main_dir=str(wd),
            batch_id="fp", infer=False, dtype="float32",
            # host-vote mode: these tests compare the per-panel prob
            # matrices against the dict-oracle merge (device voting has
            # its own parity suite, test_device_voting.py)
            device_voting=False,
        ),
        models_dir=str(wd / "none"),
    )
    a.preprocess()
    a.predict()
    return a


def test_all_three_heads_with_full_priority(ann):
    p = ann.channel_parser
    assert p.immune_full and p.struct and p.nerve
    rec = ann.records[0]
    # immune priority: only the full head runs (model.py:246-301)
    assert set(rec.panel_probs) == {"immune_full", "structure", "nerve_cell"}
    assert rec.panel_probs["immune_full"].shape == (N_CELLS, 12)


def test_branch1_merge_with_others_slot(ann):
    rec = ann.records[0]
    labels, conf = merge_by_voting(
        PanelProbs("immune_full", rec.panel_probs["immune_full"]),
        PanelProbs("structure", rec.panel_probs["structure"]),
        PanelProbs("nerve_cell", rec.panel_probs["nerve_cell"]),
        ann.confidence_thresh, ann.cell_type_confidence,
    )
    assert ann.annotations[0] == labels
    np.testing.assert_allclose(ann.confidence[0], conf)
    assert str(ann.cell_types[-1]) == "Others"
