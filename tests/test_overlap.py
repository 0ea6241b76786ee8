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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _ref_decode_layer(x, lw, cache, positions, cfg):
    """Single-device per-slot decode-layer oracle (dense weights)."""
    from mxq_tpu.models import llama
    b = x.shape[0]
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    h = llama.rms_norm(x, lw["input_layernorm"], cfg.rms_norm_eps)
    q = (h @ lw["q_proj"]).reshape(b, 1, nh, d)
    k = (h @ lw["k_proj"]).reshape(b, 1, nkv, d)
    v = (h @ lw["v_proj"]).reshape(b, 1, nkv, d)
    cos, sin = llama.rope_tables(cfg, positions[:, None].astype(jnp.float32))
    q, k = llama.apply_rope(q, k, cos.astype(q.dtype), sin.astype(q.dtype))
    rows = jnp.arange(b)
    ck = cache["k"].at[rows, positions].set(k[:, 0])
    cv = cache["v"].at[rows, positions].set(v[:, 0])
    kk, vv = ck, cv
    if nkv != nh:
        rep = nh // nkv
        kk = jnp.repeat(kk, rep, axis=2)
        vv = jnp.repeat(vv, rep, axis=2)
    s = kk.shape[1]
    qf = q[:, 0].astype(jnp.float32)
    kf = kk.transpose(0, 2, 1, 3).astype(jnp.float32)
    st = jnp.einsum("bhd,bhsd->bhs", qf, kf) / np.sqrt(d)
    mask = jnp.arange(s)[None, None, :] <= positions[:, None, None]
    st = jnp.where(mask, st, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(st, axis=-1)
    ctx = jnp.einsum("bhs,bhsd->bhd", p,
                     vv.transpose(0, 2, 1, 3).astype(jnp.float32))
    ctx = ctx.reshape(b, nh * d).astype(x.dtype)
    x = x + ctx @ lw["o_proj"]
    h2 = llama.rms_norm(x, lw["post_attention_layernorm"], cfg.rms_norm_eps)
    act = (jax.nn.silu((h2 @ lw["gate_proj"]).astype(jnp.float32))
           * (h2 @ lw["up_proj"]).astype(jnp.float32)).astype(x.dtype)
    return x + act @ lw["down_proj"], {"k": ck, "v": cv}


@pytest.mark.slow
def test_tp_decoder_layer_dense_matches_reference():
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=16, vocab_size=128)
    tp = 2
    rng = np.random.RandomState(7)
    h = cfg.hidden_size

    def w(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32)) * 0.02

    lw = {"q_proj": w(h, h), "k_proj": w(h, h), "v_proj": w(h, h),
          "o_proj": w(h, h), "gate_proj": w(h, cfg.intermediate_size),
          "up_proj": w(h, cfg.intermediate_size),
          "down_proj": w(cfg.intermediate_size, h),
          "input_layernorm": jnp.ones((h,), jnp.float32),
          "post_attention_layernorm": jnp.ones((h,), jnp.float32)}
    b, s = 2, 16
    x = jnp.asarray(rng.randn(b, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32)}
    positions = jnp.array([3, 7], jnp.int32)
    y_ref, c_ref = _ref_decode_layer(x, lw, cache, positions, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y, c = tp_layer.tp_decode_layer(mesh, x, lw, cache, positions, cfg,
                                    lambda a, b_: a @ b_)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c["k"]), np.asarray(c_ref["k"]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_tp_decoder_layer_packed():
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=16, vocab_size=128)
    tp = 2
    rng = np.random.RandomState(8)
    h = cfg.hidden_size

    def pw(i, o):
        return packfmt.quantize_pack(
            jnp.asarray(rng.randn(o, i).astype(np.float32)) * 0.05, CFG)

    lw = {n: pw(h, h) for n in ("q_proj", "k_proj", "v_proj", "o_proj")}
    lw["gate_proj"] = pw(h, cfg.intermediate_size)
    lw["up_proj"] = pw(h, cfg.intermediate_size)
    lw["down_proj"] = pw(cfg.intermediate_size, h)
    lw["input_layernorm"] = jnp.ones((h,), jnp.float32)
    lw["post_attention_layernorm"] = jnp.ones((h,), jnp.float32)

    dense = {k: (packfmt.unpack_dequant(v, CFG)
                 if isinstance(v, packfmt.PackedMXQLinear) else v)
             for k, v in lw.items()}
    b, s = 2, 16
    x = jnp.asarray(rng.randn(b, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32)}
    positions = jnp.array([5, 11], jnp.int32)
    y_ref, _ = _ref_decode_layer(x, dense, cache, positions, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y, _ = tp_layer.tp_decode_layer(
        mesh, x, lw, cache, positions, cfg,
        lambda a, p: mm.mxq_matmul(a, p, CFG))
    err = (np.abs(np.asarray(y) - np.asarray(y_ref)).max()
           / (np.abs(np.asarray(y_ref)).max() + 1e-9))
    assert err < 3e-2, err


def _ref_prefill_layer(x, lw, cache, cfg):
    """Single-device prefill-layer oracle (dense weights), positions 0..T-1."""
    from mxq_tpu.models import llama
    b, t, _ = x.shape
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    h = llama.rms_norm(x, lw["input_layernorm"], cfg.rms_norm_eps)
    q = (h @ lw["q_proj"]).reshape(b, t, nh, d)
    k = (h @ lw["k_proj"]).reshape(b, t, nkv, d)
    v = (h @ lw["v_proj"]).reshape(b, t, nkv, d)
    pos = jnp.arange(t, dtype=jnp.float32)[None].repeat(b, 0)
    cos, sin = llama.rope_tables(cfg, pos)
    q, k = llama.apply_rope(q, k, cos.astype(q.dtype), sin.astype(q.dtype))
    ck = cache["k"].at[:, :t].set(k)
    cv = cache["v"].at[:, :t].set(v)
    kk, vv = k, v
    if nkv != nh:
        rep = nh // nkv
        kk = jnp.repeat(kk, rep, axis=2)
        vv = jnp.repeat(vv, rep, axis=2)
    qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kf = kk.transpose(0, 2, 1, 3).astype(jnp.float32)
    st = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(d)
    causal = (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])
    st = jnp.where(causal[None, None], st, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(st, axis=-1)
    ctx = jnp.einsum("bhts,bhsd->bhtd", p,
                     vv.transpose(0, 2, 1, 3).astype(jnp.float32))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * d).astype(x.dtype)
    x = x + ctx @ lw["o_proj"]
    h2 = llama.rms_norm(x, lw["post_attention_layernorm"], cfg.rms_norm_eps)
    act = (jax.nn.silu((h2 @ lw["gate_proj"]).astype(jnp.float32))
           * (h2 @ lw["up_proj"]).astype(jnp.float32)).astype(x.dtype)
    x = x + act @ lw["down_proj"]
    return x, {"k": ck, "v": cv}


@pytest.mark.slow
def test_tp_prefill_layer_dense_matches_reference():
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=16, vocab_size=128)
    tp = 2
    rng = np.random.RandomState(12)
    h = cfg.hidden_size

    def w(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32)) * 0.02

    lw = {"q_proj": w(h, h), "k_proj": w(h, h), "v_proj": w(h, h),
          "o_proj": w(h, h), "gate_proj": w(h, cfg.intermediate_size),
          "up_proj": w(h, cfg.intermediate_size),
          "down_proj": w(cfg.intermediate_size, h),
          "input_layernorm": jnp.ones((h,), jnp.float32),
          "post_attention_layernorm": jnp.ones((h,), jnp.float32)}
    b, t, s = 2, 8, 16
    x = jnp.asarray(rng.randn(b, t, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32)}
    y_ref, c_ref = _ref_prefill_layer(x, lw, cache, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=tp)
    y, c = tp_layer.tp_prefill_layer(mesh, x, lw, cache, cfg,
                                     lambda a, b_: a @ b_)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c["k"]), np.asarray(c_ref["k"]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_tp_prefill_layer_packed():
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=16, vocab_size=128)
    rng = np.random.RandomState(13)
    h = cfg.hidden_size

    def pw(i, o):
        return packfmt.quantize_pack(
            jnp.asarray(rng.randn(o, i).astype(np.float32)) * 0.05, CFG)

    lw = {n: pw(h, h) for n in ("q_proj", "k_proj", "v_proj", "o_proj")}
    lw["gate_proj"] = pw(h, cfg.intermediate_size)
    lw["up_proj"] = pw(h, cfg.intermediate_size)
    lw["down_proj"] = pw(cfg.intermediate_size, h)
    lw["input_layernorm"] = jnp.ones((h,), jnp.float32)
    lw["post_attention_layernorm"] = jnp.ones((h,), jnp.float32)
    dense = {k: (packfmt.unpack_dequant(v, CFG)
                 if isinstance(v, packfmt.PackedMXQLinear) else v)
             for k, v in lw.items()}
    b, t, s = 2, 8, 16
    x = jnp.asarray(rng.randn(b, t, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 16, cfg.head_dim), jnp.float32)}
    y_ref, _ = _ref_prefill_layer(x, dense, cache, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=2)
    y, _ = tp_layer.tp_prefill_layer(
        mesh, x, lw, cache, cfg, lambda a, p: mm.mxq_matmul(a, p, CFG))
    err = (np.abs(np.asarray(y) - np.asarray(y_ref)).max()
           / (np.abs(np.asarray(y_ref)).max() + 1e-9))
    assert err < 3e-2, err


@pytest.mark.slow
def test_tp_decode_layer_gqa():
    """GQA (nkv < nh, the 70B config's shape class) through the overlapped
    TP decode layer matches the single-device oracle."""
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=4, vocab_size=128)
    rng = np.random.RandomState(14)
    h = cfg.hidden_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def w(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32)) * 0.02

    lw = {"q_proj": w(h, h), "k_proj": w(h, kv), "v_proj": w(h, kv),
          "o_proj": w(h, h), "gate_proj": w(h, cfg.intermediate_size),
          "up_proj": w(h, cfg.intermediate_size),
          "down_proj": w(cfg.intermediate_size, h),
          "input_layernorm": jnp.ones((h,), jnp.float32),
          "post_attention_layernorm": jnp.ones((h,), jnp.float32)}
    b, s = 2, 16
    x = jnp.asarray(rng.randn(b, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 4, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 4, cfg.head_dim), jnp.float32)}
    positions = jnp.array([3, 7], jnp.int32)
    y_ref, c_ref = _ref_decode_layer(x, lw, cache, positions, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=2)
    y, c = tp_layer.tp_decode_layer(mesh, x, lw, cache, positions, cfg,
                                    lambda a, b_: a @ b_)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c["k"]), np.asarray(c_ref["k"]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_tp_prefill_layer_gqa():
    """GQA through the overlapped TP prefill layer (70B shape class)."""
    from mxq_tpu.models import llama
    from mxq_tpu.parallel import tp_layer

    cfg = llama.LlamaConfig.tiny(hidden_size=2048, intermediate_size=2048,
                                 num_attention_heads=16,
                                 num_key_value_heads=4, vocab_size=128)
    rng = np.random.RandomState(15)
    h = cfg.hidden_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def w(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32)) * 0.02

    lw = {"q_proj": w(h, h), "k_proj": w(h, kv), "v_proj": w(h, kv),
          "o_proj": w(h, h), "gate_proj": w(h, cfg.intermediate_size),
          "up_proj": w(h, cfg.intermediate_size),
          "down_proj": w(cfg.intermediate_size, h),
          "input_layernorm": jnp.ones((h,), jnp.float32),
          "post_attention_layernorm": jnp.ones((h,), jnp.float32)}
    b, t, s = 2, 8, 16
    x = jnp.asarray(rng.randn(b, t, h).astype(np.float32)) * 0.3
    cache = {"k": jnp.zeros((b, s, 4, cfg.head_dim), jnp.float32),
             "v": jnp.zeros((b, s, 4, cfg.head_dim), jnp.float32)}
    y_ref, c_ref = _ref_prefill_layer(x, lw, cache, cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=1, tp=2)
    y, c = tp_layer.tp_prefill_layer(mesh, x, lw, cache, cfg,
                                     lambda a, b_: a @ b_)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c["k"]), np.asarray(c_ref["k"]),
                               rtol=2e-3, atol=2e-3)
