"""Collective/compute-overlapped TP matmuls (parallel/overlap.py) vs
single-device references, on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.parallel import overlap, sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = MXQConfig()


def test_dense_tp_block_matches_reference():
    k = n = 2048
    tp = 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, k).astype(np.float32))
    wc = jnp.asarray(rng.randn(k, n).astype(np.float32)) * 0.05
    wr = jnp.asarray(rng.randn(n, n).astype(np.float32)) * 0.05
    ref = (x @ wc) @ wr

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y = overlap.tp_block_matmuls(
        mesh, x, wc, wr, lambda a, b: a @ b,
        n_ktiles_local=k // overlap.KT_COLS // tp, chunk_cols=n // tp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_dense_tp4():
    k = n = 4096
    tp = 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, k).astype(np.float32))
    wc = jnp.asarray(rng.randn(k, n).astype(np.float32)) * 0.05
    wr = jnp.asarray(rng.randn(n, n).astype(np.float32)) * 0.05
    ref = (x @ wc) @ wr
    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y = overlap.tp_block_matmuls(
        mesh, x, wc, wr, lambda a, b: a @ b,
        n_ktiles_local=k // overlap.KT_COLS // tp, chunk_cols=n // tp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_packed_tp_block_matches_reference():
    """Packed dequant-matmul through the overlapped column+row TP pair."""
    k = n = 2048
    tp = 2
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, k).astype(np.float32))
    wc = jnp.asarray(rng.randn(n, k).astype(np.float32))   # [O, K]
    wr = jnp.asarray(rng.randn(n, n).astype(np.float32))
    pc = packfmt.quantize_pack(wc, CFG)
    pr = packfmt.quantize_pack(wr, CFG)

    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    h_ref = xb @ packfmt.unpack_dequant(pc, CFG)
    y_ref = (h_ref.astype(jnp.bfloat16).astype(jnp.float32)
             @ packfmt.unpack_dequant(pr, CFG))

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y = overlap.tp_block_matmuls(
        mesh, x, pc, pr, lambda a, p: mm.mxq_matmul(a, p, CFG),
        n_ktiles_local=k // overlap.KT_COLS // tp, chunk_cols=n // tp)
    err = (np.abs(np.asarray(y) - np.asarray(y_ref)).max()
           / (np.abs(np.asarray(y_ref)).max() + 1e-9))
    assert err < 2e-2, err


def test_packed_ktile_slices_are_additive():
    """Summing partial matmuls over disjoint k-tile slices == full matmul."""
    k, n = 2048, 1024
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(n, k).astype(np.float32))
    p = packfmt.quantize_pack(w, CFG)
    x = jnp.asarray(rng.randn(2, k).astype(np.float32))
    full = mm.mxq_matmul(x, p, CFG)
    parts = []
    n_kt = p.nbp // packfmt.NB_TILE
    for t in range(n_kt):
        pt = overlap.slice_ktiles(p, t, 1)
        xt = x[:, t * overlap.KT_COLS:(t + 1) * overlap.KT_COLS]
        parts.append(mm.mxq_matmul(xt, pt, CFG))
    got = sum(parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_packed_tp_mlp_matches_reference():
    """Full overlapped MLP block (gate+up one ring pass, silu, down
    reduce-scatter) vs the single-device packed reference."""
    k, inter = 2048, 2048
    tp = 2
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, k).astype(np.float32) * 0.3)
    pg = packfmt.quantize_pack(
        jnp.asarray(rng.randn(inter, k).astype(np.float32) * 0.2), CFG)
    pu = packfmt.quantize_pack(
        jnp.asarray(rng.randn(inter, k).astype(np.float32) * 0.2), CFG)
    pd = packfmt.quantize_pack(
        jnp.asarray(rng.randn(k, inter).astype(np.float32) * 0.2), CFG)

    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    g = xb @ packfmt.unpack_dequant(pg, CFG)
    u = xb @ packfmt.unpack_dequant(pu, CFG)
    h = (jax.nn.silu(g) * u).astype(jnp.bfloat16).astype(jnp.float32)
    y_ref = h @ packfmt.unpack_dequant(pd, CFG)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y = overlap.tp_packed_mlp(
        mesh, x, pg, pu, pd, lambda a, p: mm.mxq_matmul(a, p, CFG),
        n_ktiles_local=k // overlap.KT_COLS // tp, chunk_cols=k // tp)
    err = (np.abs(np.asarray(y) - np.asarray(y_ref)).max()
           / (np.abs(np.asarray(y_ref)).max() + 1e-9))
    assert err < 3e-2, err


def test_dense_tp_mlp():
    k = inter = 2048
    tp = 2
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, k).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(k, inter).astype(np.float32) * 0.05)
    u = jnp.asarray(rng.randn(k, inter).astype(np.float32) * 0.05)
    d = jnp.asarray(rng.randn(inter, k).astype(np.float32) * 0.05)
    ref = (jax.nn.silu(x @ g) * (x @ u)) @ d
    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y = overlap.tp_packed_mlp(mesh, x, g, u, d, lambda a, b: a @ b,
                              n_ktiles_local=k // overlap.KT_COLS // tp,
                              chunk_cols=k // tp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
