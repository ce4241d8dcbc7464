"""Per-channel image normalization as one jitted XLA program.

Replicates the reference ``ImageProcessor._normalize`` (preprocess.py:214-239)
exactly, but branchlessly and vmapped over channels so the whole CHW stack
normalizes in a single device dispatch:

  1. background = gaussian(channel, sigma=20), clipped at 125, subtracted,
     result clipped at 0;
  2. optional gaussian blur with sigma=blur;
  3. all-nonpositive channels become constant -1;
  4. upper clip at the ``amax`` percentile, only when that percentile > 20;
  5. scale to [-1, 1] via 2*(x / max(25, max(x))) - 1.

Data-dependent branches (percentile guard, empty-channel fill) are
jnp.where-selected, which is equivalent because every branch is a pure
elementwise rescale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ribca_tpu.ops.gaussian import gaussian_blur

BG_SIGMA = 20.0
BG_CLIP = 125.0
PCT_GUARD = 20.0
SCALE_FLOOR = 25.0


def _normalize_channel(ch: jnp.ndarray, blur: float, amax: float) -> jnp.ndarray:
    ch = ch.astype(jnp.float32)

    bg = gaussian_blur(ch, BG_SIGMA, mode="reflect")
    bg = jnp.minimum(bg, BG_CLIP)
    ch = jnp.clip(ch - bg, 0.0, None)

    if blur:
        ch = gaussian_blur(ch, float(blur), mode="reflect")

    has_signal = jnp.any(ch > 0)

    thresh = jnp.percentile(ch, amax)
    clipped = jnp.where(thresh > PCT_GUARD, jnp.clip(ch, 0.0, thresh), ch)

    denom = jnp.maximum(SCALE_FLOOR, jnp.max(clipped))
    scaled = 2.0 * (clipped / denom) - 1.0

    return jnp.where(has_signal, scaled, jnp.full_like(ch, -1.0))


@functools.partial(jax.jit, static_argnames=("blur", "amax"))
def normalize_image(img: jnp.ndarray, blur: float = 0.0, amax: float = 100.0):
    """Normalize a CHW stack; returns float32 in [-1, 1]."""
    fn = functools.partial(_normalize_channel, blur=blur, amax=amax)
    return jax.vmap(fn)(img.astype(jnp.float32))
