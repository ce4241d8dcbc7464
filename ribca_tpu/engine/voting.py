"""Ensemble vote merging — vectorized, semantics-exact.

The reference merges per-panel softmax dicts cell-by-cell in pure Python
(model.py:481-639): seven explicit combination branches with subtly
different rules. Here each branch is a handful of (N, K) @ (K, 18) numpy
ops over the whole image — same float32 addition order per cell (immune,
then structure, then nerve), same first-max tie-breaking as ``max(vote,
key=vote.get)`` — so labels match the reference bit-for-bit.

Branch rules replicated exactly:

* full+struct+nerve (model.py:483-507): ALL class probs are summed into
  the vote, including each head's "Others" — the vote gains an 18th
  "Others" slot (inserted last, so argmax ties still prefer the 17 named
  keys).  NOTE: the reference's own code would raise KeyError here
  (``vote[k] += pred[k]`` with k="Others" on the 17-key dict from
  utils.py:143-146); we implement the evident intent instead of the crash
  and document the divergence.
* pairwise branches (model.py:509-581): "Others" probs are EXCLUDED from
  the vote but still drive the threshold via min(o_i..., confidence);
  threshold override applies when cell_type_confidence[type] >= 0
  (the reference tests ``< 0`` for fallback).
* single-panel branches (model.py:583-636): argmax over the head's own
  classes; an argmax of "Others" is accepted unconditionally
  (model.py:600,614,628); override applies only when strictly > 0.
* immune priority: only ONE immune head ever contributes — full >
  extended > base (elif chain, model.py:246-301); e.g. extended+struct+
  nerve falls into the immune+struct branch and nerve is IGNORED.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS, VOTE_KEYS

# Vote-vector name order: the 17 void-vote keys, then the "Others" slot the
# immune_full branch appends.
VOTE_NAMES: tuple[str, ...] = VOTE_KEYS + ("Others",)
_OTHERS_SLOT = len(VOTE_KEYS)
_NAME_TO_SLOT = {n: i for i, n in enumerate(VOTE_NAMES)}


@dataclasses.dataclass
class PanelProbs:
    """Softmax outputs of one classifier head for one image."""

    panel: str           # panel name in PANEL_CLASS_MAPS
    probs: np.ndarray    # (N, num_classes) float32


def scatter_matrix(panel: str, include_others: bool) -> np.ndarray:
    """(num_classes, 18) scatter of head classes into the vote vector."""
    cmap = PANEL_CLASS_MAPS[panel]
    mat = np.zeros((len(cmap), len(VOTE_NAMES)), dtype=np.float32)
    for idx, name in cmap.items():
        if name == "Others" and not include_others:
            continue
        mat[idx, _NAME_TO_SLOT[name]] = 1.0
    return mat


def _others_col(p: PanelProbs) -> np.ndarray:
    cmap = PANEL_CLASS_MAPS[p.panel]
    for idx, name in cmap.items():
        if name == "Others":
            return p.probs[:, idx]
    raise KeyError(p.panel)


def _class_names(panel: str) -> list[str]:
    cmap = PANEL_CLASS_MAPS[panel]
    return [cmap[i] for i in range(len(cmap))]


def _thresholds(
    names: np.ndarray,
    override: np.ndarray,
    fallback: np.ndarray,
    strict_positive: bool,
) -> np.ndarray:
    """Per-cell threshold: override[name] when set, else fallback.

    ``strict_positive`` selects the single-panel rule (override > 0) vs the
    multi-panel rule (override >= 0, i.e. fallback only when < 0)."""
    ov = override[names]
    use_override = ov > 0 if strict_positive else ov >= 0
    return np.where(use_override, ov, fallback).astype(np.float32)


def _override_vector(cell_type_confidence: dict, names) -> np.ndarray:
    return np.asarray(
        [cell_type_confidence.get(n, -1.0) for n in names], dtype=np.float32
    )


def _multi_panel_merge(
    heads: list[PanelProbs],
    include_others: bool,
    confidence_thresh: float,
    cell_type_confidence: dict,
):
    vote = np.zeros((heads[0].probs.shape[0], len(VOTE_NAMES)), np.float32)
    for h in heads:
        vote += h.probs.astype(np.float32) @ scatter_matrix(
            h.panel, include_others
        )
    others = np.stack([_others_col(h) for h in heads], axis=1)

    # max(vote, key=vote.get): first key in insertion order wins ties. With
    # Others excluded its slot stays 0 and never beats a real key unless all
    # are <= 0 (softmax probs are positive, so unreachable).
    width = len(VOTE_NAMES) if include_others else len(VOTE_KEYS)
    arg = np.argmax(vote[:, :width], axis=1)
    best = vote[np.arange(len(arg)), arg]

    fallback = np.minimum(others.min(axis=1), np.float32(confidence_thresh))
    override = _override_vector(cell_type_confidence, VOTE_NAMES)
    thresh = _thresholds(arg, override, fallback, strict_positive=False)

    accept = best >= thresh
    names = np.asarray(VOTE_NAMES, dtype=object)[arg]
    labels = np.where(accept, names, "Others")
    conf = np.where(accept, best, np.float32(-1)).astype(np.float32)
    return list(labels), conf


def _single_panel_merge(
    head: PanelProbs, confidence_thresh: float, cell_type_confidence: dict
):
    probs = head.probs.astype(np.float32)
    names = _class_names(head.panel)
    arg = np.argmax(probs, axis=1)
    best = probs[np.arange(len(arg)), arg]

    override = _override_vector(cell_type_confidence, names)
    fallback = np.full(len(arg), confidence_thresh, np.float32)
    thresh = _thresholds(arg, override, fallback, strict_positive=True)

    is_others = np.asarray([names[a] == "Others" for a in arg], dtype=bool)
    accept = is_others | (best >= thresh)
    name_arr = np.asarray(names, dtype=object)[arg]
    labels = np.where(accept, name_arr, "Others")
    conf = np.where(accept, best, np.float32(-1)).astype(np.float32)
    return list(labels), conf


def merge_by_voting(
    immune: PanelProbs | None,
    structure: PanelProbs | None,
    nerve: PanelProbs | None,
    confidence_thresh: float,
    cell_type_confidence: dict,
) -> tuple[list[str], np.ndarray]:
    """Merge one image's panel probabilities into labels + confidences.

    ``immune`` is the single winning immune head (full > extended > base).
    Returns (labels list[str] length N, confidence float32 (N,))."""
    cc = cell_type_confidence

    if immune is not None and immune.panel == "immune_full" \
            and structure is not None and nerve is not None:
        return _multi_panel_merge(
            [immune, structure, nerve], True, confidence_thresh, cc
        )
    if immune is not None and structure is not None:
        return _multi_panel_merge(
            [immune, structure], False, confidence_thresh, cc
        )
    if structure is not None and nerve is not None:
        return _multi_panel_merge(
            [structure, nerve], False, confidence_thresh, cc
        )
    if immune is not None and nerve is not None:
        return _multi_panel_merge(
            [immune, nerve], False, confidence_thresh, cc
        )
    if immune is not None:
        return _single_panel_merge(immune, confidence_thresh, cc)
    if structure is not None:
        return _single_panel_merge(structure, confidence_thresh, cc)
    if nerve is not None:
        return _single_panel_merge(nerve, confidence_thresh, cc)
    raise ValueError("No predictions to merge")
