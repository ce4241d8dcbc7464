"""RIBCA-TPU: a TPU-native cell-type annotation framework for multiplexed tissue images.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sun-huangqingbo/multiplexed-image-annotator (RIBCA, Cell Systems 2025):
given a CHW multiplexed TIFF, an instance segmentation mask and a marker
panel, it crops a 40x40 patch per cell, runs an ensemble of ViT
classifiers (one per supported antibody panel), merges softmax outputs by
probability-sum voting with confidence thresholds, and emits per-cell
annotations plus spatial statistics.

Design goals (vs the torch/timm reference):
  * all dense compute (normalization, patch extraction, soft-masking,
    ViT/MAE inference, voting) runs as jitted XLA programs on TPU with
    static shapes;
  * the host side is a thin streaming layer (TIFF decode, manifest
    handling, result writers) double-buffered against the device;
  * multi-chip scaling is 1-D data parallelism over the cell axis via
    ``jax.sharding`` meshes (the models are <25M params, so DP is the only
    parallelism that pays — SURVEY §2 rows 24-25).

Public surface mirrors the reference: :class:`ribca_tpu.api.Annotator`,
``ribca_tpu.cli.main``, ``ribca_tpu.api.gui_api`` / ``batch_process``.
"""

__version__ = "0.1.0"

from ribca_tpu.utils.config import AnnotatorConfig  # noqa: F401
