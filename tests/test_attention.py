"""Pallas fused attention (interpret mode) vs the XLA composition."""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.ops.attention import fused_attention, reference_attention


@pytest.mark.parametrize("heads,hd", [(12, 12), (12, 48)])
def test_fused_matches_reference(rng, heads, hd):
    q, k, v = (
        jnp.asarray(rng.normal(size=(4, heads, 101, hd)).astype(np.float32))
        for _ in range(3)
    )
    a = np.asarray(fused_attention(q, k, v, hd**-0.5, block_b=4,
                                   interpret=True))
    b = np.asarray(reference_attention(q, k, v, hd**-0.5))
    # same math; differences bounded by the backend's matmul rounding
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=0)
    assert a.shape == (4, heads, 101, hd)


def test_padded_queries_do_not_leak(rng):
    """Key masking: padded key positions contribute zero weight."""
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 2, 101, 16)).astype(np.float32))
        for _ in range(3)
    )
    out = np.asarray(fused_attention(q, k, v, 0.25, block_b=2,
                                     interpret=True))
    ref = np.asarray(reference_attention(q, k, v, 0.25))
    np.testing.assert_allclose(out, ref, atol=2e-2)
