"""Separable Gaussian filtering on device.

Replaces the reference's two host-side Gaussian paths with XLA convs:

* ``scipy.ndimage.gaussian_filter`` (mode='reflect', truncate=4.0) used for
  background estimation and optional blur (preprocess.py:219-226);
* ``skimage.filters.gaussian`` (mode='nearest', truncate=4.0) used inside the
  per-cell soft mask (utils.py:265).

Kernels are built exactly like scipy's ``_gaussian_kernel1d`` so results
match the reference bit-for-bit up to f32 accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PAD_MODE = {"reflect": "symmetric", "nearest": "edge", "mirror": "reflect"}


@functools.lru_cache(maxsize=64)
def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy-compatible 1-D Gaussian taps (odd length 2r+1, normalized)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (float(sigma) ** 2) * x**2)
    phi = phi / phi.sum()
    return phi.astype(np.float32)


def _conv1d_along(x: jnp.ndarray, taps: jnp.ndarray, axis: int, mode: str):
    """Correlate `x` with `taps` along `axis` with scipy-style edge handling.

    x: (..., H, W); conv runs on one of the two trailing axes. Implemented as
    a grouped conv_general_dilated so XLA lowers it to efficient TPU code.
    """
    radius = taps.shape[0] // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode=_PAD_MODE[mode])

    # collapse all non-conv axes into the batch dim
    moved = jnp.moveaxis(xp, axis, -1)
    lead_shape = moved.shape[:-1]
    flat = moved.reshape(int(np.prod(lead_shape)) if lead_shape else 1, 1, -1)
    kernel = taps.reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        flat,
        kernel,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        # full f32 accumulation: on TPU the default would use bf16 passes,
        # which breaks parity with the scipy-defined reference math
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out.reshape(*lead_shape, out.shape[-1])
    return jnp.moveaxis(out, -1, axis)


def gaussian_blur(
    x: jnp.ndarray,
    sigma: float,
    mode: str = "reflect",
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Separable 2-D Gaussian over the two trailing axes of ``x``.

    mode='reflect' reproduces scipy.ndimage.gaussian_filter defaults;
    mode='nearest' reproduces skimage.filters.gaussian defaults.
    """
    if sigma <= 0:
        return x
    taps = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    x = _conv1d_along(x, taps, axis=x.ndim - 2, mode=mode)
    x = _conv1d_along(x, taps, axis=x.ndim - 1, mode=mode)
    return x
