"""Model registry: locate, convert, and cache ensemble weights.

The reference hardcodes cwd-relative ``.pth`` paths (model.py:189-239,
markerImputer.py:258-270) and silently skips panels whose checkpoint is
absent. Here a registry owns one models directory, resolves per-panel
weights in priority order

  1. ``<name>.npz``  — native converted store (models/store.py);
  2. ``<name>.pth``  — torch checkpoint, converted on first use and cached
     as ``.npz`` so torch is never needed again;
  3. deterministic random init — only when ``allow_random`` (used by tests
     and shape-validation runs; every such load is logged loudly).

Checkpoint basenames follow the reference: ``immune_base``,
``immune_extended``, ``immune_full``, ``struct``, ``nerve`` and
``<immune_panel>_impute`` for the MAE imputers.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ribca_tpu.models import store
from ribca_tpu.models.convert import (
    convert_mae_state_dict,
    convert_vit_state_dict,
    load_torch_checkpoint,
)
from ribca_tpu.models.mae import build_imputer_model
from ribca_tpu.models.vit import build_panel_model, init_params_np

CLASSIFIER_BASENAME = {
    "immune_base": "immune_base",
    "immune_extended": "immune_extended",
    "immune_full": "immune_full",
    "structure": "struct",
    "nerve_cell": "nerve",
}

DEFAULT_MODELS_DIR = os.path.join(os.path.dirname(__file__), "weights")


class ModelRegistry:
    def __init__(self, models_dir: str | None = None, logger=None,
                 allow_random: bool = True):
        self.models_dir = models_dir or DEFAULT_MODELS_DIR
        self.logger = logger
        self.allow_random = allow_random
        self._cache: dict[str, dict] = {}
        # hashable identity of each loaded weight set ("file" + stat, or
        # "random"): lets the engine cache cast+uploaded device params
        # across Annotator instances (engine/ensemble.py) without risking
        # stale weights when a checkpoint file is replaced on disk
        self.fingerprints: dict[str, tuple] = {}
        # set when any component fell back to random init; surfaced as a
        # RANDOM_WEIGHTS marker in log.txt and trace.json so such runs
        # cannot be mistaken for real ones after the fact
        self.used_random = False

    def _log(self, msg: str) -> None:
        if self.logger is not None:
            self.logger.log(msg)

    def _warn_random(self, what: str) -> None:
        """Missing weights are easy to miss in log.txt alone; also shout
        to stderr so a misconfigured models_dir is visible at the console
        (review finding: a 'successful' run with random weights)."""
        import sys

        msg = (
            f"WARNING: {what} weights not found in {self.models_dir}; "
            "using RANDOM initialization — annotations will be "
            "meaningless. Run ribca_tpu.models.download or set "
            "allow_random_weights=False to make this fatal."
        )
        self.used_random = True
        self._log(msg)
        print(msg, file=sys.stderr)

    @staticmethod
    def _file_fingerprint(path: str) -> tuple:
        st = os.stat(path)
        return ("file", os.path.abspath(path), st.st_mtime_ns, st.st_size)

    def _resolve(self, basename: str, is_mae: bool, fp_key: str):
        npz = os.path.join(self.models_dir, f"{basename}.npz")
        if os.path.exists(npz):
            self.fingerprints[fp_key] = self._file_fingerprint(npz)
            return store.load_params(npz)
        pth = os.path.join(self.models_dir, f"{basename}.pth")
        if os.path.exists(pth):
            self.fingerprints[fp_key] = self._file_fingerprint(pth)
            sd = load_torch_checkpoint(pth)
            params = (
                convert_mae_state_dict(sd) if is_mae
                else convert_vit_state_dict(sd)
            )
            try:
                store.save_params(params, npz)
                self._log(f"Converted {basename}.pth -> {basename}.npz")
            except OSError:
                pass
            return params
        return None

    def classifier_params(self, panel: str):
        """Flax params for a panel's classifier, or None when weights are
        missing and random init is disallowed."""
        key = f"cls:{panel}"
        if key in self._cache:
            return self._cache[key]
        params = self._resolve(CLASSIFIER_BASENAME[panel], is_mae=False,
                               fp_key=key)
        if params is None:
            if not self.allow_random:
                self._log(f"{panel} classifier weights not found")
                return None
            self._warn_random(f"{panel} classifier")
            self.fingerprints[key] = ("random", CLASSIFIER_BASENAME[panel])
            params = init_params_np(build_panel_model(panel), seed=0)
        self._cache[key] = params
        return params

    def imputer_params(self, panel: str):
        key = f"mae:{panel}"
        if key in self._cache:
            return self._cache[key]
        params = self._resolve(f"{CLASSIFIER_BASENAME[panel]}_impute",
                               is_mae=True, fp_key=key)
        if params is None:
            if not self.allow_random:
                self._log(f"{panel} imputer weights not found")
                return None
            self._warn_random(f"{panel} imputer")
            self.fingerprints[key] = (
                "random", f"{CLASSIFIER_BASENAME[panel]}_impute"
            )
            model = build_imputer_model(panel)
            import jax
            import numpy as np

            h, w = model.img_size
            dummy = jnp.zeros((1, 1, h, w), jnp.float32)
            l = (h // 40) * (w // 40)
            ids = jnp.arange(l, dtype=jnp.int32)
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), dummy, ids, ids)[
                    "params"
                ]
            )
            rng = np.random.default_rng(0)
            params = jax.tree_util.tree_map(
                lambda s: (rng.standard_normal(s.shape) * 0.02).astype(
                    s.dtype
                ),
                shapes,
            )
        self._cache[key] = params
        return params
