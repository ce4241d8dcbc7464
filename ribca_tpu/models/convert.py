"""Torch checkpoint -> Flax params conversion.

The reference ships torch ``.pth`` files with a ``{"model": state_dict}``
layout (model.py:191 etc.; markerImputer.py:261-271). This module maps
timm-style ViT / MAE state dicts onto the param trees of
:mod:`ribca_tpu.models.vit` / :mod:`ribca_tpu.models.mae`:

  * Linear: torch (out, in) -> flax kernel (in, out);
  * Conv2d: torch (out, in, kh, kw) -> flax kernel (kh, kw, in, out);
  * LayerNorm: weight -> scale;
  * cls_token/pos_embed/mask_token pass through.
"""

from __future__ import annotations

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    return {
        "kernel": _t(sd[f"{prefix}.weight"]).T,
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _conv(sd, prefix):
    return {
        "kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _norm(sd, prefix):
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _block(sd, prefix):
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_vit_state_dict(sd: dict, depth: int = 12) -> dict:
    params = {
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "norm": _norm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(sd, f"blocks.{i}")
    return params


def convert_mae_state_dict(sd: dict, depth: int = 12,
                           decoder_depth: int = 8) -> dict:
    params = {
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "mask_token": _t(sd["mask_token"]),
        "decoder_pos_embed": _t(sd["decoder_pos_embed"]),
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "norm": _norm(sd, "norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "decoder_norm": _norm(sd, "decoder_norm"),
        "decoder_pred": _linear(sd, "decoder_pred"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(sd, f"blocks.{i}")
    for i in range(decoder_depth):
        params[f"decoder_blocks_{i}"] = _block(sd, f"decoder_blocks.{i}")
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint to a numpy state dict."""
    import torch  # lazy: torch is only needed for one-time conversion

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
