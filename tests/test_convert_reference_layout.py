"""Byte-faithful reference-checkpoint-format roundtrips.

The published checkpoints are ``torch.save``-d dicts with a ``"model"``
state-dict entry plus training artifacts that require
``weights_only=False`` to unpickle (model.py:188-239,
markerImputer.py:255-284). These tests build fixtures in that exact
layout — fused qkv weights, MAE fixed sin-cos ``requires_grad=False``
position buffers, non-tensor checkpoint entries (epoch ints, an
``argparse.Namespace``, optimizer state) — write them as real ``.pth``
files, and roundtrip every one of the 8 reference basenames through
``load_torch_checkpoint`` -> converter -> ModelRegistry -> forward parity
against the torch mirror loading the same file. The registry's ``.npz``
conversion cache is verified on top.
"""

import argparse
import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ribca_tpu.models.mae import (
    build_imputer_model,
    get_2d_sincos_pos_embed,
    masking_plan,
)
from ribca_tpu.models.registry import CLASSIFIER_BASENAME, ModelRegistry
from ribca_tpu.models.vit import build_panel_model
from ribca_tpu.panels.vocab import IMPUTER_MOSAIC, PANEL_MODEL_SPECS

from tests.torch_mirror import TorchMAE, TorchViT

DIMS = {"vit_tiny": 144, "vit_s": 288, "vit_m": 384, "vit_l": 576}


def _wrap_reference_ckpt(sd) -> dict:
    """The exact on-disk layout: {"model": sd} + weights_only=False
    artifacts a training loop pickles alongside the weights."""
    return {
        "model": sd,
        "optimizer": {
            "state": {},
            "param_groups": [{"lr": 1e-4, "weight_decay": 0.05}],
        },
        "epoch": 299,
        "scaler": None,
        "args": argparse.Namespace(
            batch_size=256, model="mae_vit", norm_pix_loss=False
        ),
    }


def write_classifier_pth(path: str, panel: str, seed: int) -> TorchViT:
    arch, in_chans, n_cls = PANEL_MODEL_SPECS[panel]
    torch.manual_seed(seed)
    tm = TorchViT(in_chans, n_cls, DIMS[arch]).eval()
    # randomize params away from the zero inits so parity is meaningful
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    torch.save(_wrap_reference_ckpt(tm.state_dict()), path)
    return tm


def write_imputer_pth(path: str, panel: str, seed: int) -> TorchMAE:
    gh, gw = IMPUTER_MOSAIC[panel]
    torch.manual_seed(seed)
    tm = TorchMAE(img_size=(gh * 40, gw * 40)).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
        # the real checkpoints carry FIXED sin-cos position buffers
        # (markerImputer.py:84,98: requires_grad=False sin-cos)
        tm.pos_embed.copy_(torch.from_numpy(
            get_2d_sincos_pos_embed(768, (gh, gw), cls_token=True)[None]
        ))
        tm.decoder_pos_embed.copy_(torch.from_numpy(
            get_2d_sincos_pos_embed(512, (gh, gw), cls_token=True)[None]
        ))
    torch.save(_wrap_reference_ckpt(tm.state_dict()), path)
    return tm


@pytest.mark.parametrize("panel", list(CLASSIFIER_BASENAME))
def test_classifier_pth_roundtrip(panel, tmp_path):
    basename = CLASSIFIER_BASENAME[panel]
    pth = str(tmp_path / f"{basename}.pth")
    tm = write_classifier_pth(pth, panel, seed=hash(panel) % 1000)

    registry = ModelRegistry(str(tmp_path), allow_random=False)
    params = registry.classifier_params(panel)
    assert params is not None, "registry failed to resolve the .pth"

    _, in_chans, _ = PANEL_MODEL_SPECS[panel]
    x = np.random.default_rng(0).normal(
        size=(2, in_chans, 40, 40)
    ).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    model = build_panel_model(panel)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    # conversion must have been cached as .npz, and the cached copy must
    # produce identical outputs through a fresh registry
    npz = str(tmp_path / f"{basename}.npz")
    assert os.path.exists(npz)
    params2 = ModelRegistry(
        str(tmp_path), allow_random=False
    ).classifier_params(panel)
    ours2 = np.asarray(model.apply({"params": params2}, jnp.asarray(x)))
    np.testing.assert_allclose(ours2, ours, atol=1e-6)


@pytest.mark.parametrize("panel", list(IMPUTER_MOSAIC))
def test_imputer_pth_roundtrip(panel, tmp_path):
    basename = f"{CLASSIFIER_BASENAME[panel]}_impute"
    pth = str(tmp_path / f"{basename}.pth")
    tm = write_imputer_pth(pth, panel, seed=hash(panel) % 1000)

    registry = ModelRegistry(str(tmp_path), allow_random=False)
    params = registry.imputer_params(panel)
    assert params is not None

    gh, gw = IMPUTER_MOSAIC[panel]
    l = gh * gw
    present = list(range(0, l, 2))  # every other tile kept
    ids_keep, ids_restore, _ = masking_plan(present, l)
    x = np.random.default_rng(1).normal(
        size=(2, 1, gh * 40, gw * 40)
    ).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x),
            torch.from_numpy(ids_keep.astype(np.int64)),
            torch.from_numpy(ids_restore.astype(np.int64)),
        ).numpy()
    model = build_imputer_model(panel)
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(ids_keep), jnp.asarray(ids_restore),
    ))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)
    assert os.path.exists(str(tmp_path / f"{basename}.npz"))


def test_load_handles_bare_state_dict(tmp_path):
    """Some re-exports drop the {"model": ...} wrapper; the loader takes
    the dict as-is then (models/convert.py:97)."""
    from ribca_tpu.models.convert import load_torch_checkpoint

    torch.manual_seed(7)
    tm = TorchViT(3, 2, 144)
    pth = str(tmp_path / "bare.pth")
    torch.save(tm.state_dict(), pth)
    sd = load_torch_checkpoint(pth)
    assert "cls_token" in sd and "blocks.0.attn.qkv.weight" in sd
    assert all(isinstance(v, np.ndarray) for v in sd.values())
