"""MarkerParser semantics vs the reference contract (markerParse.py)."""

import pytest

from ribca_tpu.panels import MarkerParser, PANELS, get_void_vote, CELL_TYPES
from ribca_tpu.panels.vocab import (
    PANEL_CLASS_MAPS,
    class_prob_matrix,
    others_index,
    VOTE_KEYS,
)

EXAMPLE_MARKERS = [
    "DAPI", "CD31", "aSMA", "CD34", "CD4", "CD8", "CD68", "Ki67", "CD11c",
    "CollagenIV", "CD163", "CD45", "CD56", "Vimentin", "CD3", "CD20", "PanCK",
]


class _FakeLogger:
    def __init__(self):
        self.lines = []

    def log(self, msg):
        self.lines.append(msg)


def test_vocab_sizes():
    assert len(CELL_TYPES) == 18
    assert len(get_void_vote()) == 17
    assert len(PANELS) == 5
    assert [len(PANELS[p]) for p in PANELS] == [7, 10, 15, 7, 3]


def test_example_markers_strict(tmp_marker_file):
    p = MarkerParser(strict=True, logger=_FakeLogger())
    p.parse(tmp_marker_file(EXAMPLE_MARKERS))
    # strict: immune_base needs all 7 (all present), extended misses nothing?
    # extended needs CD68, CD163, CD56 - present; base all present.
    assert p.immune_base
    assert p.immune_extended
    # full needs CD15, CD138, FoxP3, Granzyme B, Trypase - missing -> not applied
    assert not p.immune_full
    assert p.struct
    # nerve needs GFAP - missing
    assert not p.nerve


def test_example_markers_tolerant(tmp_marker_file):
    p = MarkerParser(strict=False, logger=_FakeLogger())
    p.parse(tmp_marker_file(EXAMPLE_MARKERS))
    # immune_full misses 5 markers > budget 3 -> still not applied
    assert not p.immune_full
    assert p.immune_base and p.immune_extended and p.struct
    # nerve panel has 3 markers: tolerance never applies
    assert not p.nerve


def test_indices_order_and_missing(tmp_marker_file):
    markers = ["CD45", "CD20", "CD4", "CD8", "DAPI", "CD11c", "CD3"]
    p = MarkerParser(strict=True, logger=_FakeLogger())
    p.parse(tmp_marker_file(markers))
    assert p.indices["immune_base"] == [0, 1, 2, 3, 4, 5, 6]
    assert p.indices["structure"] is None


def test_missing_budget_boundary(tmp_marker_file):
    # extended panel tolerates exactly 2 missing when strict=False
    markers = [m for m in PANELS["immune_extended"] if m not in ("CD68", "CD163")]
    p = MarkerParser(strict=False, logger=_FakeLogger())
    p.parse(tmp_marker_file(markers))
    idx = p.indices["immune_extended"]
    assert idx is not None and idx.count(-1) == 2

    markers3 = [m for m in PANELS["immune_extended"]
                if m not in ("CD68", "CD163", "CD56")]
    p3 = MarkerParser(strict=False, logger=_FakeLogger())
    p3.parse(tmp_marker_file(markers3))
    assert p3.indices["immune_extended"] is None


def test_alias_replacement(tmp_marker_file):
    markers = ["DNA-long-name", "CD3e", "CD79", "CD45", "CD4", "CD8", "CD11c"]
    # use names long enough that numpy's fixed-width dtype doesn't truncate
    markers[0] = "DNA"
    lg = _FakeLogger()
    p = MarkerParser(strict=True, logger=lg)
    p.parse(tmp_marker_file(markers))
    # DNA->DAPI, CD3e->CD3, CD79->CD20 (dtype is U4 here: wide enough)
    assert p.indices["immune_base"] is not None
    # original names are preserved in .markers
    assert p.markers[0] == "DNA"


def test_alias_skipped_when_canonical_present(tmp_marker_file):
    markers = ["DAPI", "DNA", "CD45", "GFAP"]
    p = MarkerParser(strict=True, logger=_FakeLogger())
    p.parse(tmp_marker_file(markers))
    # DNA not replaced because DAPI already present
    assert p.nerve
    assert p.indices["nerve_cell"] == [0, 2, 3]


def test_class_prob_matrix_shapes():
    for panel, cmap in PANEL_CLASS_MAPS.items():
        m = class_prob_matrix(panel)
        assert m.shape == (len(cmap), len(VOTE_KEYS))
        oi = others_index(panel)
        assert m[oi].sum() == 0
        # every non-Others row is a one-hot
        for idx, name in cmap.items():
            if name != "Others":
                assert m[idx].sum() == 1
                assert m[idx, VOTE_KEYS.index(name)] == 1


def test_config_json_roundtrip(tmp_path):
    from ribca_tpu.utils.config import AnnotatorConfig

    cfg = AnnotatorConfig.from_json("/root/reference/hyperparameters.json")
    assert cfg.batch_size == 256
    assert cfg.upper_limit == 100
    assert cfg.blur == 1
    assert cfg.strict is False
    assert cfg.cell_type_confidence["B cell"] == 1
    assert cfg.cell_type_confidence["CD4 T cell"] == -1
    d = cfg.to_dict()
    cfg2 = AnnotatorConfig.from_dict(d)
    assert cfg2.upper_limit == cfg.upper_limit
