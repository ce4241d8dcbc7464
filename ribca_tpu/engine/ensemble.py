"""Jitted ensemble execution over fixed-shape cell chunks.

The reference streams ``.pt`` patch files from disk and runs each panel's
classifier in a separate torch loop (model.py:351-426), re-cropping patches
per panel during preprocessing. Here the whole ensemble step for a chunk of
cells is ONE XLA program:

    full-channel patches (B, C, 40, 40)
      -> per-panel channel gather (ops/patches.py, free inside XLA)
      -> optional MAE imputation of missing channels (models/mae.py)
      -> ViT forward + f32 softmax per active head

so every head, the imputer, and the gathers fuse into a single dispatch per
chunk, parameters live on device once, and the cell axis is sharded over
the device mesh (parallel/mesh.py) with replicated weights — the TPU
equivalent of the reference's single-GPU minibatch loop.

Head selection replicates model.py:241-349: exactly one immune head (full >
extended > base) plus structure and nerve when matched. Imputation applies
only to immune panels with missing markers when ``infer`` is on
(preprocess.py:268-281; the ``panel == "nerve"`` comparison there can never
match the "nerve_cell" key, and structure is explicitly excluded).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.models.mae import (
    IMPUTER_MOSAIC,
    build_imputer_model,
    masking_plan,
    tile_mosaic,
    unpatchify,
    untile_mosaic,
)
from ribca_tpu.models.vit import build_panel_model
from ribca_tpu.ops.patches import PanelGather, apply_panel_gather, build_panel_gather
from ribca_tpu.parallel.mesh import cell_sharding, get_mesh, replicated_sharding


# sink/output key of the fused device vote stats (engine/voting.py)
VOTE_STATS_KEY = "vote_stats"


def prediction_panels(parser) -> list[str]:
    """Panels the ensemble actually runs (model.py:241-349 elif chains)."""
    panels = []
    if parser.immune_full:
        panels.append("immune_full")
    elif parser.immune_extended:
        panels.append("immune_extended")
    elif parser.immune_base:
        panels.append("immune_base")
    if parser.struct:
        panels.append("structure")
    if parser.nerve:
        panels.append("nerve_cell")
    return panels


@dataclasses.dataclass
class _HeadSpec:
    panel: str
    gather: PanelGather
    model: object
    imputer: Optional[object]           # MAE model or None
    ids_keep: Optional[jnp.ndarray]
    ids_restore: Optional[jnp.ndarray]
    mask_img: Optional[jnp.ndarray]     # (1, 1, Hm, Wm) pixel mask


# Structurally identical runners share ONE jitted program object, so a
# second Annotator in the same process (a batch CLI loop, the GUI running
# two jobs, bench warm runs) re-traces nothing and recompiles nothing.
# Key: per-head (panel, gather plan, imputation plan) + dtype + mesh.
# Everything the traced program closes over is derived deterministically
# from that key (models from panel+dtype, ids/masks from the plan), so
# reusing the first-built closure is exact.
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_CAP = 64

# Cast+uploaded device parameters shared across runners: a new Annotator
# per job (the batch CLI loop, the GUI, the annotation server, bench warm
# runs) used to re-cast and re-upload every head's weights (~0.5-0.9 s per
# job measured on the 1-core host — the per-leaf cast dispatches dominate,
# not the wire bytes). Keyed on the registry's weight-file fingerprints
# (path+mtime+size, so replacing a checkpoint on disk invalidates), the
# compute dtype, and the mesh. Capped small: each entry pins a full
# ensemble's params in HBM (~25-350 MB depending on heads + imputers).
_DEVICE_PARAMS_CACHE: dict = {}
_DEVICE_PARAMS_CACHE_CAP = 2


def _mesh_signature(mesh) -> tuple:
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


class EnsembleRunner:
    """Compiles and runs the fused ensemble program for one marker parse.

    Parameters stay on device across calls; chunk shape is static so the
    program compiles once per (chunk, C) and is reused for every chunk of
    every image in a batch run.
    """

    def __init__(
        self,
        parser,
        registry,
        n_channels: int,
        infer: bool = True,
        dtype=jnp.bfloat16,
        mesh=None,
        logger=None,
        device_voting: bool = False,
    ):
        self.mesh = mesh if mesh is not None else get_mesh()
        self.dtype = dtype
        self.logger = logger
        self.device_voting = bool(device_voting)
        self.vote_plan = None
        self.specs: list[_HeadSpec] = []
        self.params: dict = {}
        self.imputer_params: dict = {}

        for panel in prediction_panels(parser):
            indices = parser.indices[panel]
            gather = build_panel_gather(indices, n_channels)
            model = build_panel_model(panel, dtype=dtype)
            params = registry.classifier_params(panel)
            if params is None:
                if logger is not None:
                    logger.log(f"Skipping {panel}: no weights")
                continue
            self.params[panel] = params

            imputer = ids_keep = ids_restore = mask_img = None
            needs_impute = (
                infer
                and -1 in indices
                and panel in IMPUTER_MOSAIC  # immune panels only
            )
            if needs_impute:
                mae_params = registry.imputer_params(panel)
                if mae_params is not None:
                    imputer = build_imputer_model(panel, dtype=dtype)
                    grid = IMPUTER_MOSAIC[panel]
                    l = grid[0] * grid[1]
                    present = [
                        k for k, v in enumerate(indices) if int(v) != -1
                    ]
                    ik, ir, token_mask = masking_plan(present, l)
                    ids_keep = jnp.asarray(ik)
                    ids_restore = jnp.asarray(ir)
                    mask_img = unpatchify(
                        jnp.asarray(token_mask)[None, :, None]
                        * jnp.ones((1, l, 1600), jnp.float32),
                        grid, 40,
                    )
                    self.imputer_params[panel] = mae_params

            self.specs.append(
                _HeadSpec(panel, gather, model, imputer, ids_keep,
                          ids_restore, mask_img)
            )

        if not self.specs:
            raise ValueError("No classifier heads available to run")

        if self.device_voting:
            from ribca_tpu.engine.voting import build_vote_plan

            self.vote_plan = build_vote_plan([s.panel for s in self.specs])

        key = self._program_signature()
        cached = _PROGRAM_CACHE.get(key)
        if cached is None:
            self._fn = self._build()
            if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_CAP:
                _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
            _PROGRAM_CACHE[key] = (self.forward, self._fn)
        else:
            self.forward, self._fn = cached
        self._device_params = None
        # device-params cache key: every loaded weight set must have a
        # registry fingerprint, else opt out (weights of unknown origin)
        fps = getattr(registry, "fingerprints", {})
        sig = []
        for s in self.specs:
            cls_fp = fps.get(f"cls:{s.panel}")
            mae_fp = (
                fps.get(f"mae:{s.panel}") if s.imputer is not None else None
            )
            if cls_fp is None or (s.imputer is not None and mae_fp is None):
                sig = None
                break
            sig.append((s.panel, cls_fp, mae_fp))
        self._weights_key = (
            (tuple(sig), jnp.dtype(self.dtype).name,
             _mesh_signature(self.mesh))
            if sig is not None else None
        )

    def _program_signature(self) -> tuple:
        spec_sig = tuple(
            (
                s.panel,
                s.gather.gather_idx,
                s.gather.blank,
                s.imputer is not None,
                tuple(np.asarray(s.ids_keep).tolist())
                if s.ids_keep is not None else None,
            )
            for s in self.specs
        )
        return (spec_sig, jnp.dtype(self.dtype).name,
                _mesh_signature(self.mesh), self.device_voting)

    # -- program ------------------------------------------------------------

    def _build(self):
        specs = self.specs
        plan = self.vote_plan

        def run(patches_full, params, imputer_params):
            out = {}
            for s in specs:
                x = apply_panel_gather(patches_full, s.gather)
                if s.imputer is not None:
                    grid = IMPUTER_MOSAIC[s.panel]
                    mosaic = tile_mosaic(x, grid)
                    pred = s.imputer.apply(
                        {"params": imputer_params[s.panel]},
                        mosaic, s.ids_keep, s.ids_restore,
                    )
                    pred_img = unpatchify(pred, grid, 40)
                    composite = (
                        mosaic * (1.0 - s.mask_img) + pred_img * s.mask_img
                    )
                    x = untile_mosaic(composite, grid, 40)
                logits = s.model.apply({"params": params[s.panel]}, x)
                out[s.panel] = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                )
            if plan is not None:
                # on-device merge (SURVEY §7): only the three per-cell
                # scalars the host thresholding needs ever leave the
                # device (~12 B/cell vs ~80 B/cell full-panel probs).
                # Heads the reference's merge branch ignores (e.g. nerve
                # under immune+structure, model.py:509-527) become dead
                # code here and XLA eliminates their compute entirely.
                from ribca_tpu.engine.voting import device_vote_stats

                return {VOTE_STATS_KEY: device_vote_stats(out, plan)}
            return out

        data = cell_sharding(self.mesh)
        rep = replicated_sharding(self.mesh)
        # unjitted body, composable inside larger jitted programs (bench.py
        # chains it through a fori_loop; tiled.py could fuse it per band)
        self.forward = run
        return jax.jit(
            run,
            in_shardings=(data, rep, rep),
            out_shardings=data,
        )

    # -- execution ----------------------------------------------------------

    def _cast_params(self, tree):
        """Pre-cast matmul params to the compute dtype ONCE (halves HBM
        traffic and host->device upload); LayerNorm params stay f32 — the
        blocks run their norms in f32 (models/vit.py)."""
        if self.dtype == jnp.float32:
            return tree

        def cast(path, leaf):
            keep_f32 = any(
                getattr(k, "key", "").startswith(
                    ("norm", "decoder_norm", "head", "decoder_pred")
                )
                for k in path
            )
            leaf = jnp.asarray(leaf)
            if keep_f32 or not jnp.issubdtype(leaf.dtype, jnp.floating):
                return leaf
            return leaf.astype(self.dtype)

        return jax.tree_util.tree_map_with_path(cast, tree)

    def _params_on_device(self):
        if self._device_params is None:
            cached = (
                _DEVICE_PARAMS_CACHE.get(self._weights_key)
                if self._weights_key is not None else None
            )
            if cached is not None:
                self._device_params = cached
                return cached
            rep = replicated_sharding(self.mesh)
            put = lambda t: jax.device_put(  # noqa: E731
                self._cast_params(t), rep
            )
            self._device_params = (put(self.params), put(self.imputer_params))
            if self._weights_key is not None:
                if len(_DEVICE_PARAMS_CACHE) >= _DEVICE_PARAMS_CACHE_CAP:
                    _DEVICE_PARAMS_CACHE.pop(next(iter(_DEVICE_PARAMS_CACHE)))
                _DEVICE_PARAMS_CACHE[self._weights_key] = self._device_params
        return self._device_params

    @property
    def output_spec(self) -> dict[str, int]:
        """Columns of each f32 output matrix ``run_chunk`` emits — the
        shape contract the cohort packer's sinks preallocate against."""
        if self.vote_plan is not None:
            from ribca_tpu.engine.voting import VOTE_STATS_WIDTH

            return {VOTE_STATS_KEY: VOTE_STATS_WIDTH}
        return {s.panel: s.model.num_classes for s in self.specs}

    def run_chunk(self, patches_full) -> dict:
        """patches_full: (B, C, 40, 40) device or host array, B a multiple
        of the mesh size. Returns {panel: (B, n_classes) f32 DeviceArray},
        or {"vote_stats": (B, 3)} when device voting is on."""
        params, imp = self._params_on_device()
        return self._fn(patches_full, params, imp)

    def run_cells(self, chunks) -> dict[str, np.ndarray]:
        """Run a sequence of (patches, n_valid) chunks; returns per-key
        output matrices over all valid cells, on host."""
        per_key: dict[str, list[np.ndarray]] = {
            k: [] for k in self.output_spec
        }
        for patches, n_valid in chunks:
            probs = self.run_chunk(patches)
            for key, arr in probs.items():
                per_key[key].append(np.asarray(arr[:n_valid]))
        widths = self.output_spec
        return {
            key: (
                np.concatenate(parts, axis=0)
                if parts else np.zeros((0, widths[key]), np.float32)
            )
            for key, parts in per_key.items()
        }
