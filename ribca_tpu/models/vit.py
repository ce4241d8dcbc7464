"""Flax Vision Transformer classifier family.

Architecture contract (reference model.py:31-88, timm semantics):
  * patch_embed Conv k=4 s=4 over 40x40 -> 100 tokens + cls, learned
    pos_embed over 101 positions;
  * 12 pre-norm blocks: x + attn(norm1(x)), x + mlp(norm2(x)); fused qkv
    with bias; 12 heads; exact (erf) GELU; LayerNorm eps 1e-6;
  * logits = head(norm(tokens)[:, 0]).

Widths: tiny=144, s=288, m=384, l=576 (model.py:66-88). All matmuls accept
a compute dtype (bf16 on TPU for speed; f32 for parity tests); LayerNorm
and softmax stay f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ribca_tpu.panels.vocab import PANEL_MODEL_SPECS

Dtype = Any


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` running its matmul on the int8 MXU path.

    Same parameter names/shapes as ``nn.Dense`` (kernel/bias), so float
    checkpoints load unchanged; quantization happens inside the jitted
    forward each dispatch (weights are runtime inputs, and the absmax +
    round passes are trivial next to the matmul):

    * weights: per-output-channel symmetric int8 (absmax / 127);
    * activations: per-tensor dynamic symmetric int8;
    * accumulation: int32 (``preferred_element_type``), rescaled by the
      product of the two scales and biased in the compute dtype.

    Status: MEASURED EXPERIMENTAL VARIANT, not wired into production.
    v5e chained-loop numbers (B=8192, 2026-08-18): the raw s8xs8->s32 dot
    runs 1.6-1.9x the bf16 rate at these shapes (285 vs 175 TF/s at
    k=576), but THIS dynamic-scale layer makes the full heads SLOWER —
    immune_full 0.98x, structure 0.89x, nerve 0.91x — because the absmax
    reduce + round/clip/convert passes add VPU/bandwidth work to models
    that are already >=56% VPU/bandwidth-bound (BASELINE.md profile). A
    static-scale variant with pre-quantized int8 weights (no per-dispatch
    absmax/weight-quant; emulated with constant scales) measured
    1.13x/1.04x/1.04x per head = a projected ~1.09x ensemble — real but
    small, and it needs per-layer activation-scale calibration plus an
    int8 param-tree transform to ship. Recorded as the measured ceiling
    of the int8 avenue (ROADMAP); the bf16/f32 composition stays the
    production path (measured f32-label agreement: see the class
    docstring note below)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        eps = jnp.float32(1e-12)
        xf = x.astype(jnp.float32)
        s_x = jnp.max(jnp.abs(xf)) / 127.0 + eps
        x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        s_w = jnp.max(jnp.abs(kf), axis=0) / 127.0 + eps
        w_q = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q, w_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scale = (s_x * s_w).astype(self.dtype)
        return y.astype(self.dtype) * scale + bias.astype(self.dtype)


def _dense(quantized: bool, features: int, dtype, name: str):
    if quantized:
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=True, dtype=dtype, name=name)


class Attention(nn.Module):
    """Multi-head self-attention with f32 softmax (timm/torch parity).

    Perf notes from v5e measurements at B=4096 (chained-loop timing):
    isolated attention layers looked 2.4-3x faster with a bf16 softmax
    (10.5/24.2 -> 4.4/8.2 ms for widths 144/576), but inside the full
    model the bf16 softmax was ~8% SLOWER end-to-end (665.7 vs 615.6
    ms/iter for ViT-l) — XLA fuses the f32 softmax chain fine in context,
    and the extra precision-conversion boundaries hurt fusion. A fused
    single-tile Pallas kernel also measured slower than XLA at these tiny
    head dims (ops/attention.py). So: plain composition, f32 softmax —
    fastest AND bit-faithful."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        qkv = _dense(self.quantized, 3 * self.dim, self.dtype, "qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q * scale) @ k.transpose(0, 1, 3, 2)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        x = (attn @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
        return _dense(self.quantized, self.dim, self.dtype, "proj")(x)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        x = _dense(self.quantized, self.hidden, self.dtype, "fc1")(x)
        x = nn.gelu(x, approximate=False)  # timm nn.GELU is the erf form
        return _dense(self.quantized, self.dim, self.dtype, "fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          quantized=self.quantized,
                          name="attn")(y.astype(self.dtype))
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio),
                    dtype=self.dtype, quantized=self.quantized,
                    name="mlp")(y.astype(self.dtype))
        return x


class VisionTransformer(nn.Module):
    """timm-faithful ViT (reference model.py:31-88): patch-embed conv,
    cls token, 12 pre-norm blocks, f32 norms/softmax/head.

    Dtype note (measured, VERDICT r3 #2): with ``dtype=bfloat16`` (the
    production default) logits are NOT bit-identical to f32 — labels
    agree at a MEASURED rate, not by construction. On the peaked PCA-head
    fixture (tests/test_dtype_agreement.py, XLA:CPU 2026-08-20):
    argmax agreement 0.996 (the only flip at f32 top-2 margin 3e-4),
    zero flips above margin 0.05, top-prob |delta| <= ~0.02. The
    calibrated-pipeline number is measured every bench run
    (bench.measure_dtype_agreement, stderr). Exact reference parity
    (f32 torch, model.py:397-406) requires ``dtype=float32``."""

    in_chans: int
    num_classes: int
    embed_dim: int
    img_size: int = 40
    patch_size: int = 4
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, C, H, W) float; returns logits (B, num_classes) f32."""
        b = x.shape[0]
        p = self.patch_size
        grid = self.img_size // p

        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, grid * grid, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, grid * grid + 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      dtype=self.dtype, quantized=self.quantized,
                      name=f"blocks_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = x[:, 0]
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


def vit_tiny(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=144, **kw)


def vit_s(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=288, **kw)


def vit_m(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=384, **kw)


def vit_l(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=576, **kw)


ARCHS = {"vit_tiny": vit_tiny, "vit_s": vit_s, "vit_m": vit_m, "vit_l": vit_l}


def build_panel_model(panel: str, dtype=jnp.float32,
                      quantized: bool = False) -> VisionTransformer:
    """Classifier for a panel per the reference's load table
    (model.py:188-239). ``quantized`` swaps the block Dense layers for
    the int8 MXU path (QuantDense) — opt-in serving mode with its own
    (unmeasured) label-agreement cost on top of the measured bf16 one
    (see the VisionTransformer dtype note)."""
    arch, in_chans, num_classes = PANEL_MODEL_SPECS[panel]
    return ARCHS[arch](in_chans=in_chans, num_classes=num_classes,
                       dtype=dtype, quantized=quantized)


def init_params(model: nn.Module, seed: int = 0, in_shape=None):
    if in_shape is None:
        in_shape = (1, model.in_chans, model.img_size, model.img_size)
    dummy = jnp.zeros(in_shape, jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def init_params_np(model: nn.Module, seed: int = 0, in_shape=None):
    """Host-side numpy random init with the same tree structure as
    ``init_params`` — no device compile, no transfer. Used for the
    registry's random fallback and benches, where weight VALUES don't
    matter but building a fused init program on a remote accelerator
    would cost minutes."""
    import numpy as np

    shapes = jax.eval_shape(
        lambda: init_params(model, seed=seed, in_shape=in_shape)
    )
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(s.dtype),
        shapes,
    )
