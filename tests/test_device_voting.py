"""Device-side vote merge parity (engine/voting device path).

The ensemble program fuses the vote merge (model.py:481-639 semantics)
and emits only per-cell ``(argmax, best, min_others)``; thresholds apply
on host (``finish_votes``). These tests pin:

* unit parity: for every merge branch, ``device_vote_stats`` +
  ``finish_votes`` over random prob fixtures equals the host
  ``merge_by_voting`` on the same probs, bit-for-bit;
* e2e parity: one image through the Annotator with ``device_voting``
  on vs off (f32) gives identical labels + confidences;
* re-voting: thresholds changed AFTER predict() re-merge exactly.
"""

import numpy as np
import pytest

from ribca_tpu.engine.voting import (
    PanelProbs,
    build_vote_plan,
    device_vote_stats,
    finish_votes,
    merge_by_voting,
)
from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS

N = 257  # odd, spans several vote patterns


def _rand_probs(panel, rng):
    k = len(PANEL_CLASS_MAPS[panel])
    # near-uniform logits -> many near-threshold cells
    logits = rng.normal(0, 1.5, size=(N, k)).astype(np.float32)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)


BRANCHES = [
    # (panels present, which host args are set)
    (("immune_full", "structure", "nerve_cell")),
    (("immune_full", "structure")),
    (("immune_extended", "structure", "nerve_cell")),  # nerve ignored
    (("immune_base", "structure")),
    (("structure", "nerve_cell")),
    (("immune_base", "nerve_cell")),
    (("immune_base",)),
    (("structure",)),
    (("nerve_cell",)),
]


def _host_args(panels, probs):
    immune = structure = nerve = None
    for p in panels:
        pp = PanelProbs(p, probs[p])
        if p.startswith("immune"):
            immune = pp
        elif p == "structure":
            structure = pp
        else:
            nerve = pp
    return immune, structure, nerve


@pytest.mark.parametrize("panels", BRANCHES)
@pytest.mark.parametrize("overrides", [False, True])
def test_unit_parity_all_branches(panels, overrides):
    rng = np.random.default_rng(hash(panels) % (2**32))
    probs = {p: _rand_probs(p, rng) for p in panels}

    conf = 0.3
    ctc = {name: -1 for names in (
        [PANEL_CLASS_MAPS[p].values() for p in panels]
    ) for name in names}
    ctc["Others"] = -1
    if overrides:
        # exercise both override rules (>= 0 multi, > 0 single)
        some = sorted(ctc)
        ctc[some[0]] = 0.0
        ctc[some[1 % len(some)]] = 0.5
        ctc[some[2 % len(some)]] = 0.9

    ref_labels, ref_conf = merge_by_voting(
        *_host_args(panels, probs), conf, ctc
    )

    plan = build_vote_plan(list(panels))
    stats = np.asarray(device_vote_stats(
        {p: np.asarray(v) for p, v in probs.items()}, plan
    ))
    got_labels, got_conf = finish_votes(stats, plan, conf, ctc)

    assert got_labels == ref_labels
    np.testing.assert_array_equal(got_conf, ref_conf)


def _annotate(wd, device_voting, confidence=0.3):
    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.io.manifest import write_manifest
    from ribca_tpu.utils.config import AnnotatorConfig
    from tests.synth import write_fixture

    img_path, mask_path, _, _ = write_fixture(
        wd, n_channels=7, n_cells=10, h=90, w=100
    )
    mf = wd / "markers.txt"
    mf.write_text(
        "\n".join(["CD45", "CD20", "CD4", "CD8", "DAPI", "CD11c", "CD3"])
        + "\n"
    )
    csv = str(wd / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    a = Annotator(
        AnnotatorConfig(
            marker_file=str(mf), csv_file=csv, main_dir=str(wd),
            batch_id="dv", infer=False, dtype="float32",
            confidence=confidence, device_voting=device_voting,
        ),
        models_dir=str(wd / "none"),
    )
    a.preprocess()
    a.predict()
    return a


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    on = _annotate(tmp_path_factory.mktemp("dv_on"), True)
    off = _annotate(tmp_path_factory.mktemp("dv_off"), False)
    return on, off


def test_e2e_labels_identical(pair):
    on, off = pair
    assert on.annotations[0] == off.annotations[0]
    np.testing.assert_array_equal(on.confidence[0], off.confidence[0])


def test_sink_is_vote_stats(pair):
    on, off = pair
    assert set(on.records[0].panel_probs) == {"vote_stats"}
    assert on.records[0].panel_probs["vote_stats"].shape[1] == 3
    assert set(off.records[0].panel_probs) == {"immune_base"}


def test_revote_with_changed_thresholds(pair):
    on, off = pair
    for a in (on, off):
        a.confidence_thresh = 0.9
        a.merge_by_voting()
    assert on.annotations[0] == off.annotations[0]
    np.testing.assert_array_equal(on.confidence[0], off.confidence[0])
    # restore for other tests on the shared fixture
    for a in (on, off):
        a.confidence_thresh = 0.3
        a.merge_by_voting()
