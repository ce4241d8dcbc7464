"""Low-dimensional embeddings for discovery and visualization.

The reference depends on ``umap-learn`` (model.py:663,758). This
environment does not ship it, so the embedding is pluggable:

1. real ``umap-learn`` when importable (exact parity),
2. otherwise the tpu-native UMAP (``analytics/umap_tpu`` — same
   algorithm, device kNN graph + jitted layout loop; see its module
   docstring for the two documented divergences),
3. a PCA projection as the last-resort fallback (only if the device
   path raises — e.g. no usable jax backend).

Every non-umap-learn route is logged via the optional ``logger``.
"""

from __future__ import annotations

import numpy as np
from sklearn.decomposition import PCA


def _try_umap():
    try:
        import umap  # type: ignore

        return umap
    except Exception:
        return None


def embed(
    x: np.ndarray,
    n_components: int = 2,
    seed: int | None = None,
    logger=None,
) -> np.ndarray:
    """(N, D) -> (N, n_components) embedding; UMAP semantics."""
    x = np.asarray(x, dtype=np.float64)
    mod = _try_umap()
    if mod is not None:
        reducer = mod.UMAP(n_components=n_components, random_state=seed)
        return np.asarray(reducer.fit_transform(x))
    try:
        from ribca_tpu.analytics.umap_tpu import umap_embed

        if logger is not None:
            logger.log(
                "umap-learn not available; using device UMAP "
                f"({n_components} components)"
            )
        return umap_embed(
            x, n_components=n_components, seed=seed, logger=logger
        )
    except Exception as exc:  # pragma: no cover - backend failure
        if logger is not None:
            logger.log(
                f"device UMAP failed ({exc!r}); falling back to PCA "
                f"({n_components} components)"
            )
        n_components = min(n_components, x.shape[0], x.shape[1])
        return PCA(
            n_components=n_components, random_state=seed
        ).fit_transform(x)
