"""Novel-cell-type discovery over the "Others" population.

Replicates Annotator._find_extra_cell_types (model.py:642-675): collect the
mean-intensity vectors of all cells labeled "Others" across images, embed
to 5 components, HDBSCAN(min_cluster_size=min_cells); non-noise clusters
become "Additional type <k>" with confidence -1; <= 10 samples means
everything stays "Others". Triggered when min_cells > 0 (model.py:102-104,
637-639).
"""

from __future__ import annotations

import numpy as np
from sklearn.cluster import HDBSCAN

from ribca_tpu.analytics.embedding import embed


def find_extra_cell_types(
    annotations: list[list[str]],
    confidence: list[np.ndarray],
    intensity_full: list[np.ndarray],
    min_cells: int,
    root_cell_type: str = "Others",
    seed: int | None = None,
    logger=None,
) -> None:
    """Mutates ``annotations`` / ``confidence`` in place, like the ref."""
    vectors, where = [], []
    for i, labels in enumerate(annotations):
        for j, lab in enumerate(labels):
            if lab == root_cell_type:
                vectors.append(intensity_full[i][j])
                where.append((i, j))

    if not vectors:
        return
    for i, j in where:
        confidence[i][j] = -1

    if len(vectors) <= 10:
        for i, j in where:
            annotations[i][j] = root_cell_type
        return

    emb = embed(np.asarray(vectors), n_components=5, seed=seed,
                logger=logger)
    from ribca_tpu.analytics.spatial import (
        HDBSCAN_FIT_MAX,
        fit_predict_bounded,
    )

    labels = fit_predict_bounded(
        HDBSCAN(min_cluster_size=max(int(min_cells), 2)), emb,
        HDBSCAN_FIT_MAX, seed=seed, logger=logger,
        what="find_extra_cell_types[hdbscan]",
    )
    for (i, j), lab in zip(where, labels):
        if lab != -1:
            annotations[i][j] = f"Additional type {lab}"
        else:
            annotations[i][j] = root_cell_type
