"""Vectorized vote merging vs a faithful per-cell dict oracle.

The oracle below re-derives the reference's merge semantics
(model.py:481-639) cell-by-cell with Python dicts — including dict-order
tie-breaking, per-branch Others handling, and the two different threshold
override rules — and the vectorized engine must match it exactly.
"""

import numpy as np
import pytest

from ribca_tpu.engine.voting import (
    VOTE_NAMES,
    PanelProbs,
    merge_by_voting,
)
from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS, VOTE_KEYS


def softmax_rows(rng, n, k):
    x = rng.normal(size=(n, k)).astype(np.float32)
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)


def probs_dict(panel, row):
    cmap = PANEL_CLASS_MAPS[panel]
    return {cmap[i]: np.float32(row[i]) for i in range(len(cmap))}


def oracle_multi(preds_per_head, include_others, conf_thresh, ct_conf):
    """One cell: list of per-head prob dicts -> (label, confidence)."""
    vote = {k: np.float32(0) for k in VOTE_KEYS}
    others = []
    for pred in preds_per_head:
        for k, v in pred.items():
            if k == "Others":
                if include_others:
                    vote["Others"] = vote.get("Others", np.float32(0)) + v
            else:
                vote[k] = vote[k] + v
        others.append(pred["Others"])
    max_vote = max(vote, key=vote.get)
    thr = (
        min(min(others), conf_thresh)
        if ct_conf[max_vote] < 0 else ct_conf[max_vote]
    )
    if vote[max_vote] < thr:
        return "Others", -1.0
    return max_vote, float(vote[max_vote])


def oracle_single(pred, conf_thresh, ct_conf):
    max_vote = max(pred, key=pred.get)
    thr = ct_conf[max_vote] if ct_conf[max_vote] > 0 else conf_thresh
    if max_vote != "Others" and pred[max_vote] < thr:
        return "Others", -1.0
    return max_vote, float(pred[max_vote])


def default_ct_conf(**overrides):
    d = {name: -1 for name in VOTE_NAMES}
    d.update(overrides)
    return d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_struct_nerve_branch(seed):
    rng = np.random.default_rng(seed)
    n = 200
    imm = softmax_rows(rng, n, 12)
    st = softmax_rows(rng, n, 6)
    nv = softmax_rows(rng, n, 2)
    ct = default_ct_conf()
    labels, conf = merge_by_voting(
        PanelProbs("immune_full", imm), PanelProbs("structure", st),
        PanelProbs("nerve_cell", nv), 0.3, ct,
    )
    for j in range(n):
        lab, c = oracle_multi(
            [probs_dict("immune_full", imm[j]), probs_dict("structure", st[j]),
             probs_dict("nerve_cell", nv[j])],
            include_others=True, conf_thresh=0.3, ct_conf=ct,
        )
        assert labels[j] == lab
        assert conf[j] == pytest.approx(c, abs=1e-6)


@pytest.mark.parametrize(
    "heads",
    [("immune_extended", "structure", None),
     ("immune_base", "structure", None),
     (None, "structure", "nerve_cell"),
     ("immune_extended", None, "nerve_cell")],
)
def test_pairwise_branches(heads):
    rng = np.random.default_rng(7)
    n = 150
    imm_name, st_name, nv_name = heads
    args = {"immune": None, "structure": None, "nerve": None}
    dict_heads = []
    for key, name in (("immune", imm_name), ("structure", st_name),
                      ("nerve", nv_name)):
        if name:
            p = softmax_rows(rng, n, len(PANEL_CLASS_MAPS[name]))
            args[key] = PanelProbs(name, p)
            dict_heads.append((name, p))
    ct = default_ct_conf(**{"CD4 T cell": 0.9, "Stroma cell": 0.0})
    labels, conf = merge_by_voting(
        args["immune"], args["structure"], args["nerve"], 0.25, ct
    )
    for j in range(n):
        lab, c = oracle_multi(
            [probs_dict(name, p[j]) for name, p in dict_heads],
            include_others=False, conf_thresh=0.25, ct_conf=ct,
        )
        assert labels[j] == lab, f"cell {j}"
        assert conf[j] == pytest.approx(c, abs=1e-6)


@pytest.mark.parametrize("panel", list(PANEL_CLASS_MAPS))
def test_single_panel_branches(panel):
    rng = np.random.default_rng(3)
    n = 150
    p = softmax_rows(rng, n, len(PANEL_CLASS_MAPS[panel]))
    # sharpen some rows so some pass the threshold
    p[: n // 2] = np.eye(p.shape[1], dtype=np.float32)[
        rng.integers(0, p.shape[1], n // 2)
    ] * 0.9 + 0.1 / p.shape[1]
    kwargs = {"immune": None, "structure": None, "nerve": None}
    key = ("structure" if panel == "structure"
           else "nerve" if panel == "nerve_cell" else "immune")
    kwargs[key] = PanelProbs(panel, p)
    ct = default_ct_conf(**{"B cell": 0.05, "Nerve cell": 0.99})
    labels, conf = merge_by_voting(
        kwargs["immune"], kwargs["structure"], kwargs["nerve"], 0.4, ct
    )
    for j in range(n):
        lab, c = oracle_single(probs_dict(panel, p[j]), 0.4, ct)
        assert labels[j] == lab
        assert conf[j] == pytest.approx(c, abs=1e-6)


def test_immune_priority_and_ignored_nerve():
    """extended+struct+nerve must fall into the immune+struct branch with
    nerve ignored (reference branch order, model.py:509)."""
    rng = np.random.default_rng(0)
    n = 50
    imm = softmax_rows(rng, n, 8)
    st = softmax_rows(rng, n, 6)
    nv = softmax_rows(rng, n, 2)
    ct = default_ct_conf()
    with_nerve = merge_by_voting(
        PanelProbs("immune_extended", imm), PanelProbs("structure", st),
        PanelProbs("nerve_cell", nv), 0.3, ct,
    )
    without_nerve = merge_by_voting(
        PanelProbs("immune_extended", imm), PanelProbs("structure", st),
        None, 0.3, ct,
    )
    assert with_nerve[0] == without_nerve[0]
    np.testing.assert_array_equal(with_nerve[1], without_nerve[1])


def test_no_heads_raises():
    with pytest.raises(ValueError):
        merge_by_voting(None, None, None, 0.3, default_ct_conf())


def test_rejected_cells_get_minus_one():
    # both heads put their mass on Others -> every named vote is tiny and
    # the fallback threshold min(o1, o2, 0.9) stays high -> all rejected
    n = 20
    imm = np.full((n, 8), 0.1 / 7, np.float32)
    imm[:, 7] = 0.9  # Others
    st = np.full((n, 6), 0.1 / 5, np.float32)
    st[:, 5] = 0.9  # Others
    ct = default_ct_conf()
    labels, conf = merge_by_voting(
        PanelProbs("immune_extended", imm), PanelProbs("structure", st),
        None, 0.9, ct,
    )
    assert all(l == "Others" for l in labels)
    assert np.all(conf == -1)
