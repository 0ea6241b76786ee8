"""Uniform 4-bit (AWQ-style) baseline: pack/dequant roundtrip, closed-form
bit patterns (the reference's test_correct_gemv.py approach), and kernel
parity vs the jnp reference dequant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mxq_tpu.ops import uniform4 as u4


def test_closed_form_bit_pattern():
    """Words 0x76543210 with s=1, z=0: code of slab j is j, so column
    t*1024 + j*128 + r carries weight j; ones input => y = tiles * 128 *
    sum(j) exactly (the TPU port of test_correct_gemv.py:19-53's
    hand-verifiable constants)."""
    k, o = 2048, 1024
    kp, n = k, o
    p = u4.PackedU4Linear(
        w=jnp.full((kp // 8, n), 0x76543210, jnp.int32),
        s=jnp.ones((kp // u4.GROUP, n), jnp.bfloat16),
        z=jnp.zeros((kp // u4.GROUP, n), jnp.bfloat16),
        in_features=k, out_features=o)
    wk = u4.unpack_dequant_u4(p)
    # slab j == quant group j within each tile
    expect_col = np.tile(np.repeat(np.arange(8), 128), k // 1024)
    np.testing.assert_array_equal(np.asarray(wk[:, 0]), expect_col)
    x = jnp.ones((1, k), jnp.float32)
    y = u4.u4_matmul(x, p)
    assert float(y[0, 0]) == (k // 1024) * 128 * sum(range(8))


def test_pack_dequant_roundtrip_error_bounded():
    """Quantize-pack-dequant of a random weight stays within the 4-bit
    asymmetric quantization error bound: |w - w'| <= s/2 per element."""
    o, k = 192, 1100   # deliberately unpadded
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    p = u4.quantize_pack_u4(w)
    assert p.kp == 2048 and p.n_padded == 1024
    wdq = u4.unpack_dequant_u4(p).T[:o, :k]
    # per-group scale bound (bf16 scale storage adds ~2^-8 relative slack)
    gv = np.asarray(w).reshape(o, -1)
    err = np.abs(np.asarray(wdq) - gv)
    smax = (gv.max(1) - gv.min(1)) / 15
    assert (err <= smax[:, None] * 0.51 + 1e-6).all()


@pytest.mark.parametrize("b,o,k", [(1, 256, 1024), (8, 1100, 2048)])
def test_kernel_matches_reference_dequant(b, o, k):
    w = jax.random.normal(jax.random.PRNGKey(1), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, k), jnp.float32)
    p = u4.quantize_pack_u4(w)
    wk = u4.unpack_dequant_u4(p)[:k, :o]
    y_ref = x.astype(jnp.bfloat16).astype(jnp.float32) @ wk
    y = u4.u4_matmul(x, p)
    assert y.shape == (b, o)
    rel = float(jnp.max(jnp.abs(y - y_ref))) / (
        float(jnp.max(jnp.abs(y_ref))) + 1e-9)
    assert rel < 2e-2, rel


def test_leading_dims_and_dtype():
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 1024), jnp.float32)
    p = u4.quantize_pack_u4(w)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 1024), jnp.bfloat16)
    y = u4.u4_matmul(x, p)
    assert y.shape == (2, 3, 256) and y.dtype == jnp.bfloat16


class TestUniform2:
    def test_closed_form_bit_pattern(self):
        """Words 0x00000002 (code 2 in slab 0, zeros elsewhere) with s=1,
        z=0: only columns j=0 of each tile carry weight 2; ones input =>
        y = tiles * 64 * 2 exactly."""
        k, o = 2048, 1024
        p = u4.PackedU2Linear(
            w=jnp.full((k // 16, o), 0x2, jnp.int32),
            s=jnp.ones((k // u4.GROUP, o), jnp.bfloat16),
            z=jnp.zeros((k // u4.GROUP, o), jnp.bfloat16),
            in_features=k, out_features=o)
        wk = u4.unpack_dequant_u2(p)
        col = np.asarray(wk[:, 0]).reshape(k // 1024, 16, 64)
        assert (col[:, 0] == 2).all() and (col[:, 1:] == 0).all()
        y = u4.u2_matmul(jnp.ones((1, k), jnp.float32), p)
        assert float(y[0, 0]) == (k // 1024) * 64 * 2

    def test_roundtrip_error_bounded(self):
        o, k = 192, 1100
        w = jax.random.normal(jax.random.PRNGKey(5), (o, k), jnp.float32)
        p = u4.quantize_pack_u2(w)
        wdq = u4.unpack_dequant_u2(p).T[:o, :k]
        gv = np.asarray(w)
        err = np.abs(np.asarray(wdq) - gv)
        smax = (gv.max(1) - gv.min(1)) / 3
        assert (err <= smax[:, None] * 0.51 + 1e-6).all()

    @pytest.mark.parametrize("b,o,k", [(8, 1100, 2048)])
    def test_kernel_matches_reference_dequant(self, b, o, k):
        w = jax.random.normal(jax.random.PRNGKey(6), (o, k), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(7), (b, k), jnp.float32)
        p = u4.quantize_pack_u2(w)
        wk = u4.unpack_dequant_u2(p)[:k, :o]
        y_ref = x.astype(jnp.bfloat16).astype(jnp.float32) @ wk
        y = u4.u2_matmul(x, p)
        rel = float(jnp.max(jnp.abs(y - y_ref))) / (
            float(jnp.max(jnp.abs(y_ref))) + 1e-9)
        assert rel < 2e-2, rel
