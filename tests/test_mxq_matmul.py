"""Pallas dequant-matmul kernel vs the jnp reference dequant (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm

CFG = MXQConfig()


@pytest.mark.parametrize("layout", ["slab", "quad"])
@pytest.mark.parametrize("b,o,k", [
    pytest.param(1, 256, 1024, marks=pytest.mark.slow),
    (8, 256, 1024),
    pytest.param(16, 512, 2048, marks=pytest.mark.slow),
    pytest.param(5, 100, 2112, marks=pytest.mark.slow)])
def test_matches_reference_dequant(b, o, k, layout):
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG, layout=layout)
    # kernel computes with f32 dequantized weights and bf16-rounded x
    y_ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(p, CFG))
    assert y.shape == (b, o)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("o,k", [(256, 1024), (256, 2048), (100, 2112),
                                 (384, 3072)])
def test_bdg_b1_matches_reference_dequant(o, k):
    """The B=1 block-diagonal-group body (MXU group-partial reduction,
    auto-dispatched at batch 1) must be EXACT vs the reference dequant —
    codes and bf16 activations are exactly representable, so unlike the
    per-slab bodies there is no bf16-MXU rounding envelope (measured
    3.6e-7 on device, tools/probe_bdg.py)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y_ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(p, CFG))
    for layout in ("bdg", None):      # explicit and the B=1 auto-dispatch
        y = mm.mxq_matmul(x, p, CFG, layout=layout)
        assert y.shape == (1, o)
        rel = float(jnp.max(jnp.abs(y - y_ref))
                    / (jnp.max(jnp.abs(y_ref)) + 1e-9))
        assert rel < 1e-4, (layout, rel)


def test_bdg_kt_mult_and_3d():
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 2048), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 2048), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y2 = mm.mxq_matmul(x, p, CFG, layout="bdg", kt_mult=2)
    y1 = mm.mxq_matmul(x, p, CFG, layout="bdg", kt_mult=1)
    assert y2.shape == (1, 1, 128)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-4)


def test_stacked_bdg_b1_exact_and_scan():
    """Stacked-layer bdg (single-stream serving path): exact per layer,
    including a traced layer index under lax.scan."""
    l, o, k = 3, 128, 2048
    keys = jax.random.split(jax.random.PRNGKey(0), l)
    ps = [packfmt.quantize_pack(
        jax.random.normal(kk, (o, k), jnp.float32), CFG) for kk in keys]
    st = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ps)
    stacked = packfmt.PackedMXQLinear(
        w2=st.w2, w4=st.w4, meta2=st.meta2, qscale=st.qscale, qmin=st.qmin,
        smeta4=st.smeta4, in_features=k, out_features=o)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, k), jnp.float32)

    def scan_fn(carry, li):
        return carry, mm.mxq_matmul_stacked(carry, stacked, li, CFG)

    _, ys = jax.lax.scan(scan_fn, x, jnp.arange(l, dtype=jnp.int32))
    for li in range(l):
        ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
               @ packfmt.unpack_dequant(ps[li], CFG))[:, :o]
        y1 = mm.mxq_matmul_stacked(x, stacked, jnp.int32(li), CFG)
        for y in (y1, ys[li]):
            rel = float(jnp.max(jnp.abs(y - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-9))
            assert rel < 1e-4, (li, rel)


def test_bdg_requested_at_larger_batch_falls_back():
    """layout='bdg' with B>1 silently falls back to a per-slab body (the
    dense block-diagonal MXU cost scales with B)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 1024), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1024), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG, layout="bdg")
    y_ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(p, CFG))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("b,o,k", [(8, 256, 1024), (5, 100, 2112)])
def test_bfexp_layout_close(b, o, k):
    """bf16 exponent-injection layout: correct to bf16 multiply-sub
    precision (~2.5% max rel err, quality cost quantified separately)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG, layout="bfexp")
    y_ref = (x.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(p, CFG))
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_stacked_quad_layout_matches_slab():
    l, o, k, b = 2, 256, 2048, 8
    ws = jax.random.normal(jax.random.PRNGKey(20), (l, o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(21), (b, k), jnp.float32)
    ps = jax.vmap(lambda w: packfmt.quantize_pack(w, CFG))(ws)
    for i in range(l):
        ys = mm.mxq_matmul_stacked(x, ps, jnp.int32(i), CFG, layout="slab")
        yq = mm.mxq_matmul_stacked(x, ps, jnp.int32(i), CFG, layout="quad")
        np.testing.assert_allclose(np.asarray(yq), np.asarray(ys),
                                   rtol=1e-4, atol=1e-3)


def test_3d_input():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 1024), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 1024), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul(x, p, CFG)
    assert y.shape == (2, 3, 256)
    y2 = mm.mxq_matmul(x.reshape(6, 1024), p, CFG).reshape(2, 3, 256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,o,k", [(512, 256, 1024), (96, 100, 2112)])
def test_prefill_matches_reference_dequant(b, o, k):
    """GEMM-regime path: pallas dequant to slab-order bf16 planes + XLA matmul."""
    w = jax.random.normal(jax.random.PRNGKey(4), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (b, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul_prefill(x, p, None, CFG)
    wd = packfmt.unpack_dequant(p, CFG).astype(jnp.bfloat16)
    y_ref = x.astype(jnp.bfloat16) @ wd
    assert y.shape == (b, o)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=3e-2, atol=3e-1)


@pytest.mark.slow
def test_prefill_stacked_indexing():
    """Stacked [L, ...] packed weights indexed by a traced layer id."""
    l, o, k, b = 3, 256, 1024, 64
    ws = jax.random.normal(jax.random.PRNGKey(6), (l, o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, k), jnp.float32)
    ps = jax.vmap(lambda w: packfmt.quantize_pack(w, CFG))(ws)

    @jax.jit
    def at(idx):
        return mm.mxq_matmul_prefill(x, ps, idx, CFG)

    for i in range(l):
        pi = jax.tree_util.tree_map(lambda a: a[i], ps)
        y_ref = mm.mxq_matmul_prefill(x, pi, None, CFG)
        np.testing.assert_allclose(np.asarray(at(jnp.int32(i))),
                                   np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,o,k", [(512, 256, 1024), (96, 100, 2112)])
def test_prefill_a8_matches_f32_path(b, o, k):
    """W~4A8 int8-MXU prefill vs the f32 reference: per-token x per-channel
    int8 keeps relative error at the ~1% scale."""
    w = jax.random.normal(jax.random.PRNGKey(10), (o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, k), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y = mm.mxq_matmul_prefill_a8(x, p, None, CFG)
    y_ref = x @ packfmt.unpack_dequant(p, CFG)
    assert y.shape == (b, o)
    scale = float(jnp.max(jnp.abs(y_ref)))
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref))) / scale
    assert err < 0.03, err


@pytest.mark.slow
def test_prefill_a8_stacked_indexing():
    l, o, k, b = 3, 256, 1024, 64
    ws = jax.random.normal(jax.random.PRNGKey(12), (l, o, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(13), (b, k), jnp.float32)
    ps = jax.vmap(lambda w: packfmt.quantize_pack(w, CFG))(ws)

    @jax.jit
    def at(idx):
        return mm.mxq_matmul_prefill_a8(x, ps, idx, CFG)

    for i in range(l):
        pi = jax.tree_util.tree_map(lambda a: a[i], ps)
        y_ref = mm.mxq_matmul_prefill_a8(x, pi, None, CFG)
        # fusion-order f32 differences can flip an occasional int8 rounding;
        # agreement is to the int8-step scale, not bitwise
        d = np.abs(np.asarray(at(jnp.int32(i))) - np.asarray(y_ref)).max()
        assert d < 5e-3 * np.abs(np.asarray(y_ref)).max(), d


@pytest.mark.slow
def test_int8_weight_scale_bound_is_safe():
    """The metadata-derived per-channel scale bound must cover every
    dequantized weight magnitude (so int8 requant never clips)."""
    w = jax.random.normal(jax.random.PRNGKey(14), (256, 2048), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    sw = mm._int8_weight_scale(p.meta2, p.qscale, p.qmin, p.smeta4)  # [1, N]
    wd = packfmt.unpack_dequant(p, CFG)                              # [K, N]
    maxes = jnp.max(jnp.abs(wd), axis=0)
    assert bool(jnp.all(maxes <= sw[0, : maxes.shape[0]] * 127.0 * 1.0001))


def test_prefill_3d_and_agreement_with_gemv_path():
    """The two execution paths (fused GEMV kernel vs dequant+XLA GEMM) agree."""
    w = jax.random.normal(jax.random.PRNGKey(8), (256, 1024), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 40, 1024), jnp.float32)
    p = packfmt.quantize_pack(w, CFG)
    y_pre = mm.mxq_matmul_prefill(x, p, None, CFG)
    y_gemv = mm.mxq_matmul(x, p, CFG)
    assert y_pre.shape == (2, 40, 256)
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_gemv),
                               rtol=3e-2, atol=3e-1)
