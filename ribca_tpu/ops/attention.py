"""Fused short-sequence attention (Pallas TPU kernel) — EXPERIMENT.

Hypothesis: with 101 tokens and 12 heads of dim 12-48, the unfused XLA
path materializes the (B, H, L, L) logits tensor in HBM three times, so a
kernel computing QK^T -> masked softmax -> AV entirely in VMEM per
(batch-block, head) should win back the bandwidth. No online softmax is
needed (one tile IS the sequence); padded keys are masked with -inf.

Measured result on v5e (B=4096, chained-loop methodology, bench.py):

  width 144: XLA f32-softmax 10.5 ms/layer, this kernel 24.4 ms/layer
  (block_b=8 failed to compile: Mosaic rejects 4-D batched dot_general,
  so the (batch, head) dims unroll into 96+ tiny 2-D matmuls that cannot
  amortize the MXU pipeline the way XLA's batched-matmul machinery does)

i.e. XLA WINS at these shapes. (A bf16 softmax also looked faster on
ISOLATED layers — 4.4/8.2 ms — but measured ~8% SLOWER inside the full
model, so the production path is plain XLA composition with an f32
softmax; see models/vit.py Attention for those numbers.) The kernel is
retained as working, tested Pallas infrastructure and as the measured
record of why it is not the default.

Round-3 closure (v5e, chunk 8192, real jax.profiler trace over axon):
the ensemble plateau (~3.45k cells/s, 22% MXU) is INHERENT to these
shapes. Per-head: vit-l 6,533 / vit-s 13,330 / vit-tiny 19,061 cells/s
alone; serial-sum equals the fused ensemble. The tiny head's profile is
matmul fusions 40%, LayerNorm convert+reduce 28%, transpose copies 18%,
softmax reduces 10% — bandwidth/VPU-bound, and ALL measured variants
were neutral: bf16 attention logits+softmax, einsum attention (no
explicit transposes), this Pallas kernel, and (by batch-invariance
arithmetic) padded/stacked head packing. See ROADMAP.md round-3 notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, l_real,
                 block_b, heads):
    # blocks: (bq, H, Lp, hd); Mosaic supports 2-D dots, so the (batch,
    # head) dims unroll statically — every matmul stays VMEM-resident.
    for i in range(block_b):
        for j in range(heads):
            q = q_ref[i, j]  # (Lp, hd)
            k = k_ref[i, j]
            v = v_ref[i, j]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (Lp, Lp)
            key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_pos < l_real, s, -jnp.inf)
            # f32 softmax over keys (matches torch reference numerics)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[i, j] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_b", "interpret")
)
def fused_attention(q, k, v, scale: float, block_b: int = 4,
                    interpret: bool = False):
    """q, k, v: (B, H, L, hd) -> (B, H, L, hd), f32-softmax attention.

    B must be a multiple of block_b (callers pad the cell chunk)."""
    b, h, l, hd = q.shape
    lp = _round_up(l, LANE)
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b // block_b,)
    spec = pl.BlockSpec((block_b, h, lp, hd), lambda i: (i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, l_real=l,
                          block_b=block_b, heads=h),
        out_shape=jax.ShapeDtypeStruct((b, h, lp, hd), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :l, :]


def reference_attention(q, k, v, scale: float):
    """Unfused composition (the XLA path / CPU fallback)."""
    s = jnp.einsum("bhld,bhmd->bhlm", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", p, v)
