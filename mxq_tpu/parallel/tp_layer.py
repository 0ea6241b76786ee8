"""Fully-overlapped tensor-parallel decoder layer for serving decode —
the SURVEY §7.8 'multi-host collective-overlapped dequant-GEMM' applied to
one whole Llama decoder layer (attention + MLP) under shard_map.

Dataflow (activations stay K-sharded on the tp axis between blocks, so the
only collectives are the chunked rings inside overlap.py plus two scalar
psums for the RMS norms):

  x_sh [B, H/tp]
    -> sharded RMS norm (variance via one psum of local sum-squares)
    -> q/k/v column-parallel on ONE activation ring (heads land local)
    -> RoPE + per-slot cache scatter + attention, all local to the shard's
       heads (the KV cache is head-sharded, exactly how the serving engine
       shards it)
    -> o row-parallel riding the reduce-scatter ring -> residual add
    -> sharded RMS norm -> gate/up/down via overlap.tp_packed_mlp's inner
       rings -> residual add

Decode step only (T=1 per slot, per-slot positions — the engine's hot
path). Weights arrive UNFUSED (q/k/v and gate/up separate), since a fused
qkv's contiguous N-shard would split across the q|k|v section boundaries
instead of along heads.

Verified against the single-device engine decode math on the virtual CPU
mesh (tests/test_overlap.py::test_tp_decoder_layer*).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import shard_map
from jax.sharding import PartitionSpec as P

from mxq_tpu.models import llama
from mxq_tpu.packfmt import PackedMXQLinear
from mxq_tpu.parallel import overlap


def _sharded_rms_norm(x_sh, gamma_sh, hidden: int, eps: float,
                      axis_name: str):
    """RMS norm of a K-sharded activation: the row variance needs the FULL
    hidden dim -> one scalar-per-row psum of local sum-squares."""
    xf = x_sh.astype(jnp.float32)
    sumsq = jax.lax.psum(jnp.sum(xf * xf, axis=-1, keepdims=True), axis_name)
    var = sumsq / hidden
    return (xf * jax.lax.rsqrt(var + eps)).astype(x_sh.dtype) * gamma_sh


def _wspec(w, kind):
    """shard_map spec for a projection weight: column-parallel ("n") or
    row-parallel ("k"), packed or dense."""
    if isinstance(w, PackedMXQLinear):
        return overlap.packed_specs(w, kind)
    return P(None, "tp") if kind == "n" else P("tp", None)


def _ffn_half(xf, ctx, o_w, g_w, u_w, d_w, ln2, cfg, matmul, n_ktl):
    """Shared post-attention half of one decoder layer on [rows, H/tp]
    activations: o_proj riding the reduce-scatter ring, sharded RMS norm,
    gate/up on one activation ring, silu*up, down on the reduce-scatter
    ring. Returns the layer output, K-sharded like the input."""
    h_dim = cfg.hidden_size
    xf = xf + overlap.matmul_reducescatter(ctx, o_w, matmul, "tp",
                                           chunk_cols=xf.shape[-1])
    h2 = _sharded_rms_norm(xf, ln2, h_dim, cfg.rms_norm_eps, "tp")
    g, u = overlap.allgather_matmul(h2, (g_w, u_w), matmul, "tp",
                                    n_ktiles_local=n_ktl)
    inter_l = (overlap.localize(g_w).out_features
               if isinstance(g_w, PackedMXQLinear) else g_w.shape[1])
    act = (jax.nn.silu(g[..., :inter_l].astype(jnp.float32))
           * u[..., :inter_l].astype(jnp.float32)).astype(xf.dtype)
    return xf + overlap.matmul_reducescatter(act, d_w, matmul, "tp",
                                             chunk_cols=xf.shape[-1])


def tp_decode_layer(mesh, x_sh, layer, cache, positions, cfg,
                    matmul: Callable):
    """One overlapped TP decoder-layer decode step.

    x_sh      [B, H] K-sharded over tp; layer: dict with q/k/v/o_proj,
    gate/up/down_proj (PackedMXQLinear or dense [in, out]), input_layernorm,
    post_attention_layernorm. cache: {"k","v"} [B, S, H_kv, D] sharded over
    heads on tp. positions [B] per-slot write positions.
    Returns (x_sh, cache) with the same shardings.
    """
    h_dim = cfg.hidden_size
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    tp = mesh.shape["tp"]
    n_ktl = h_dim // overlap.KT_COLS // tp

    def fn(x, q_w, k_w, v_w, o_w, g_w, u_w, d_w, ln1, ln2, ck, cv, pos):
        b = x.shape[0]
        nh_l, nkv_l = nh // tp, nkv // tp

        h = _sharded_rms_norm(x, ln1, h_dim, cfg.rms_norm_eps, "tp")
        q, k, v = overlap.allgather_matmul(h, (q_w, k_w, v_w), matmul, "tp",
                                           n_ktiles_local=n_ktl)
        q = q[..., : nh_l * d].reshape(b, 1, nh_l, d)
        k = k[..., : nkv_l * d].reshape(b, 1, nkv_l, d)
        v = v[..., : nkv_l * d].reshape(b, 1, nkv_l, d)
        cos, sin = llama.rope_tables(cfg, pos[:, None].astype(jnp.float32))
        q, k = llama.apply_rope(q, k, cos.astype(q.dtype),
                                sin.astype(q.dtype))

        rows = jnp.arange(b)
        ck = ck.at[rows, pos].set(k[:, 0].astype(ck.dtype))
        cv = cv.at[rows, pos].set(v[:, 0].astype(cv.dtype))
        kk, vv = ck, cv
        if nkv_l != nh_l:
            rep = nh_l // nkv_l
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        s = kk.shape[1]
        qf = q[:, 0].astype(jnp.float32)                       # [B, Hl, D]
        kf = kk.transpose(0, 2, 1, 3).astype(jnp.float32)      # [B, Hl, S, D]
        st = jnp.einsum("bhd,bhsd->bhs", qf, kf) / np.sqrt(d)
        mask = jnp.arange(s)[None, None, :] <= pos[:, None, None]
        st = jnp.where(mask, st, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(st, axis=-1)
        ctx = jnp.einsum("bhs,bhsd->bhd", p,
                         vv.transpose(0, 2, 1, 3).astype(jnp.float32))
        ctx = ctx.reshape(b, nh_l * d).astype(x.dtype)

        # o_proj row-parallel (ctx is head(=K)-sharded) + MLP, shared with
        # the prefill layer
        x = _ffn_half(x, ctx, o_w, g_w, u_w, d_w, ln2, cfg, matmul, n_ktl)
        return x, ck, cv

    cache_spec = P(None, None, "tp", None)     # [B, S, H_kv, D]
    out = shard_map.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "tp"),
                  _wspec(layer["q_proj"], "n"), _wspec(layer["k_proj"], "n"),
                  _wspec(layer["v_proj"], "n"), _wspec(layer["o_proj"], "k"),
                  _wspec(layer["gate_proj"], "n"), _wspec(layer["up_proj"], "n"),
                  _wspec(layer["down_proj"], "k"),
                  P("tp"), P("tp"), cache_spec, cache_spec, P(None)),
        out_specs=(P(None, "tp"), cache_spec, cache_spec),
        check_rep=False)(
        x_sh, layer["q_proj"], layer["k_proj"], layer["v_proj"],
        layer["o_proj"], layer["gate_proj"], layer["up_proj"],
        layer["down_proj"], layer["input_layernorm"],
        layer["post_attention_layernorm"], cache["k"], cache["v"],
        positions)
    x_sh, ck, cv = out
    return x_sh, {"k": ck, "v": cv}


def tp_prefill_layer(mesh, x_sh, layer, cache, cfg, matmul: Callable):
    """One overlapped TP decoder-layer PREFILL pass (T tokens per slot at
    positions 0..T-1) — the same ring dataflow as tp_decode_layer with
    causal attention over the fresh tokens. Activations [B, T, H/tp] stay
    K-sharded between blocks; the matmul rings see [B*T, cols] rows.

    Returns (x_sh, cache) with rows 0..T-1 of the head-sharded cache
    written. Compute-bound prefill benefits less from hand overlap than
    decode, but the rings keep the weight traffic pattern identical across
    phases (one code path to tune on hardware).
    """
    h_dim = cfg.hidden_size
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    tp = mesh.shape["tp"]
    n_ktl = h_dim // overlap.KT_COLS // tp

    def fn(x, q_w, k_w, v_w, o_w, g_w, u_w, d_w, ln1, ln2, ck, cv):
        b, t, _ = x.shape
        nh_l, nkv_l = nh // tp, nkv // tp

        h = _sharded_rms_norm(x, ln1, h_dim, cfg.rms_norm_eps, "tp")
        hf = h.reshape(b * t, -1)
        q, k, v = overlap.allgather_matmul(hf, (q_w, k_w, v_w), matmul,
                                           "tp", n_ktiles_local=n_ktl)
        q = q[..., : nh_l * d].reshape(b, t, nh_l, d)
        k = k[..., : nkv_l * d].reshape(b, t, nkv_l, d)
        v = v[..., : nkv_l * d].reshape(b, t, nkv_l, d)
        pos = jnp.arange(t, dtype=jnp.float32)[None].repeat(b, 0)
        cos, sin = llama.rope_tables(cfg, pos)
        q, k = llama.apply_rope(q, k, cos.astype(q.dtype),
                                sin.astype(q.dtype))

        ck = ck.at[:, :t].set(k.astype(ck.dtype))
        cv = cv.at[:, :t].set(v.astype(cv.dtype))
        kk, vv = k, v
        if nkv_l != nh_l:
            rep = nh_l // nkv_l
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)       # [B,Hl,T,D]
        kf = kk.transpose(0, 2, 1, 3).astype(jnp.float32)
        st = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(d)
        causal = (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])
        st = jnp.where(causal[None, None], st, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(st, axis=-1)
        ctx = jnp.einsum("bhts,bhsd->bhtd", p,
                         vv.transpose(0, 2, 1, 3).astype(jnp.float32))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b * t, nh_l * d).astype(
            x.dtype)

        xf = _ffn_half(x.reshape(b * t, -1), ctx, o_w, g_w, u_w, d_w, ln2,
                       cfg, matmul, n_ktl)
        return xf.reshape(b, t, -1), ck, cv

    cache_spec = P(None, None, "tp", None)     # [B, S, H_kv, D]
    out = shard_map.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, "tp"),
                  _wspec(layer["q_proj"], "n"), _wspec(layer["k_proj"], "n"),
                  _wspec(layer["v_proj"], "n"), _wspec(layer["o_proj"], "k"),
                  _wspec(layer["gate_proj"], "n"), _wspec(layer["up_proj"], "n"),
                  _wspec(layer["down_proj"], "k"),
                  P("tp"), P("tp"), cache_spec, cache_spec),
        out_specs=(P(None, None, "tp"), cache_spec, cache_spec),
        check_rep=False)(
        x_sh, layer["q_proj"], layer["k_proj"], layer["v_proj"],
        layer["o_proj"], layer["gate_proj"], layer["up_proj"],
        layer["down_proj"], layer["input_layernorm"],
        layer["post_attention_layernorm"], cache["k"], cache["v"])
    x_sh, ck, cv = out
    return x_sh, {"k": ck, "v": cv}
