"""Pallas dequant-matmul kernel vs the jnp reference dequant (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm

CFG = MXQConfig()


@pytest.mark.parametrize("b,o,k", [(1, 256, 1024), (8, 256, 1024),
                                   (16, 512, 2048), (5, 100, 2112)])
def test_matches_reference_dequant(b, o, k):
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG)
    # kernel computes with f32 dequantized weights and bf16-rounded x
    y_ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(p, CFG))
    assert y.shape == (b, o)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-1)


def test_3d_input():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 1024), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 1024), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG)
    assert y.shape == (2, 3, 256)
    y2 = mm.mxq_matmul(x.reshape(6, 1024), p, CFG).reshape(2, 3, 256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)
