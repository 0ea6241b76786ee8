"""Quantized Llama in functional JAX — the TPU rebuild of the reference's
``LLM-QAT/models/modeling_llama_quant.py`` (1,092-line HF fork).

Design: a pure params-pytree + jit-friendly functions, not a module tree.
Layers are stacked along a leading axis and iterated with ``jax.lax.scan``
(one trace for all layers, fast compiles, clean sharding) instead of the
reference's Python list of modules (modeling_llama_quant.py:633,726-758).

Weight quantization modes per linear (reference QuantizeLinear,
utils_quant.py:601-727):
  * w_bits >= 32: plain matmul
  * 2 <= w_bits < 32: MXQ fake-quant with STE (MXAsymQuantizer.apply path,
    utils_quant.py:637-641) — used for QAT and PTQ-parity eval
  * packed: x @ dequant(packed) through the Pallas kernel (serving path; the
    capability the reference's cuda_kernel never wired up)

Activation quant: Sym/Asym groupwise fake-quant when 2 < a_bits < 32
(utils_quant.py:717-721). KV-cache fake-quant with SymQuantizer when
kv_bits < 32 (modeling_llama_quant.py:251-255,323-329).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import scheme
from mxq_tpu.config import MXQConfig, DEFAULT_SCHEME
from mxq_tpu.packfmt import PackedMXQLinear, quantize_pack


class StackedPackedRef:
    """Marker passed to quant_linear inside a scanned decoder: the packed
    weights stay stacked [L, ...] in HBM and the kernel indexes layer ``idx``
    via scalar prefetch (no per-layer weight slicing/copies — see
    ops.mxq_matmul.mxq_matmul_stacked)."""

    __slots__ = ("packed", "idx")

    def __init__(self, packed, idx):
        self.packed = packed
        self.idx = idx


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32        # GQA-ready (reference is MHA-only)
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # quantization switches (reference: configuration_llama.py:98-99 + train.py:58)
    w_bits: int = 32
    a_bits: int = 32
    kv_bits: int = 32
    a_symmetric: bool = True
    scheme: MXQConfig = dataclasses.field(default_factory=MXQConfig)
    # attention backend: "auto" = pallas flash attention on TPU for cache-less
    # causal forward (training/prefill), XLA einsum elsewhere; "xla" forces
    # the einsum path; "flash" forces flash attention.
    attn_impl: str = "auto"
    # packed-path prefill activation bits: 8 routes the GEMM-regime matmuls
    # through int8 MXU dots (W~4A8, 2x the bf16 MXU rate — the reference's
    # a_bits=8 SymQuantizer choice applied where it buys throughput,
    # utils_quant.py:622-626); 32 keeps the bf16-dequant path.
    prefill_act_bits: int = 32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        """A test-size config (everything divisible by the MXQ block of 64)."""
        d = dict(vocab_size=512, hidden_size=256, intermediate_size=512,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=4, max_position_embeddings=256)
        d.update(kw)
        return cls(**d)

    @classmethod
    def llama2_7b(cls, **kw) -> "LlamaConfig":
        return cls(**kw)

    @classmethod
    def llama2_13b(cls, **kw) -> "LlamaConfig":
        d = dict(hidden_size=5120, intermediate_size=13824,
                 num_hidden_layers=40, num_attention_heads=40,
                 num_key_value_heads=40)
        d.update(kw)
        return cls(**d)

    @classmethod
    def llama2_70b(cls, **kw) -> "LlamaConfig":
        d = dict(hidden_size=8192, intermediate_size=28672,
                 num_hidden_layers=80, num_attention_heads=64,
                 num_key_value_heads=8, max_position_embeddings=4096)
        d.update(kw)
        return cls(**d)


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------

LAYER_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def _linear_shapes(cfg: LlamaConfig) -> dict[str, tuple[int, int]]:
    h, i = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    return dict(q_proj=(h, h), k_proj=(h, kv), v_proj=(h, kv), o_proj=(h, h),
                gate_proj=(h, i), up_proj=(h, i), down_proj=(i, h))


def init_params(cfg: LlamaConfig, key: jax.Array,
                dtype=jnp.float32) -> dict:
    """Random-init parameter pytree. Linear weights are stored [in, out]
    (transposed from torch) so forward is x @ w."""
    keys = jax.random.split(key, 3 + len(LAYER_LINEARS))
    l = cfg.num_hidden_layers
    shapes = _linear_shapes(cfg)

    def init_stack(k, fan_in, fan_out):
        std = 1.0 / np.sqrt(fan_in)
        return (jax.random.normal(k, (l, fan_in, fan_out)) * std).astype(dtype)

    layers = {name: init_stack(keys[i], *shapes[name])
              for i, name in enumerate(LAYER_LINEARS)}
    layers["input_layernorm"] = jnp.ones((l, cfg.hidden_size), dtype)
    layers["post_attention_layernorm"] = jnp.ones((l, cfg.hidden_size), dtype)
    params = {
        "embed_tokens": (jax.random.normal(keys[-3], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((cfg.hidden_size,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (jax.random.normal(keys[-2], (cfg.hidden_size, cfg.vocab_size))
                             * 0.02).astype(dtype)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """LlamaRMSNorm (modeling_llama_quant.py:112-129): variance in f32."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight


def rope_tables(cfg: LlamaConfig, positions: jax.Array):
    """cos/sin tables for given positions [..., T] (modeling_llama_quant.py:132-196)."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B, T, H, D]; cos/sin: [B, T, D] (modeling_llama_quant.py:199-207)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q2 = q * cos + _rotate_half(q) * sin
    k2 = k * cos + _rotate_half(k) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


def quant_linear(x: jax.Array, w, cfg: LlamaConfig,
                 train: bool = False) -> jax.Array:
    """QuantizeLinear.forward (utils_quant.py:628-727): fake-quant weight
    (and optionally activations), then matmul. ``w`` is [in, out] dense, or a
    PackedMXQLinear for the packed serving path (the capability the
    reference's cuda_kernel never wired into its model)."""
    if 2 < cfg.a_bits < 32:
        if cfg.a_symmetric:
            x = scheme.sym_fake_quant_ste(x, cfg.a_bits, groupsize=128)
        else:
            x = scheme.asym_fake_quant_ste(x, cfg.a_bits, groupsize=8)
    if isinstance(w, (StackedPackedRef, PackedMXQLinear)):
        from mxq_tpu.ops import mxq_matmul as _mm
        from mxq_tpu import packfmt as _pf
        import numpy as _np
        tokens = int(_np.prod(x.shape[:-1]))
        if tokens >= 512:
            # prefill/training regime: the matmul is MXU-bound — pallas
            # dequant kernel into slab-order bf16 planes + XLA's tuned GEMM
            # (~1.5x over letting XLA fuse the jnp unpack; see
            # ops/mxq_matmul.py prefill section)
            pf = (_mm.mxq_matmul_prefill_a8 if cfg.prefill_act_bits == 8
                  and not train else _mm.mxq_matmul_prefill)
            if isinstance(w, StackedPackedRef):
                return pf(x, w.packed, w.idx, cfg.scheme)
            return pf(x, w, None, cfg.scheme)
        if isinstance(w, StackedPackedRef):
            return _mm.mxq_matmul_stacked(x, w.packed, w.idx, cfg.scheme)
        return _mm.mxq_matmul(x, w, cfg.scheme)
    if 2 <= cfg.w_bits < 32:
        fq = scheme.mxq_fake_quant_ste if train else scheme.mxq_fake_quant_qat
        w = fq(w.T, cfg.scheme).T
    elif cfg.w_bits == 1:
        # 1-bit sign path with plain STE (utils_quant.py:649-685,713)
        wq = scheme.binary_fake_quant(w.T).T
        w = jax.lax.stop_gradient(wq - w) + w if train else wq
    return x @ w


def quantize_params_packed(params: dict, cfg: LlamaConfig,
                           fuse: bool = True) -> dict:
    """Convert the 7 per-layer projection weights to stacked PackedMXQLinear
    pytrees (everything else — embeddings, norms, head — stays dense, like the
    reference which quantizes only the projections, utils_quant.py:601).

    ``fuse``: concatenate q/k/v and gate/up along the output dim into single
    packed linears (fewer, wider kernel launches; MXQ quantization is
    per-output-row, so fusion is numerically identical to separate packing).
    """
    pack = jax.vmap(lambda w: quantize_pack(w.T, cfg.scheme))
    out = dict(params)
    layers = dict(params["layers"])
    if fuse:
        layers["qkv_proj"] = pack(jnp.concatenate(
            [layers.pop("q_proj"), layers.pop("k_proj"),
             layers.pop("v_proj")], axis=-1))
        layers["gate_up_proj"] = pack(jnp.concatenate(
            [layers.pop("gate_proj"), layers.pop("up_proj")], axis=-1))
        layers["o_proj"] = pack(layers["o_proj"])
        layers["down_proj"] = pack(layers["down_proj"])
    else:
        for name in LAYER_LINEARS:
            layers[name] = pack(layers[name])
    out["layers"] = layers
    return out


def attention(x, layer, cfg: LlamaConfig, cos, sin, mask, cache=None,
              cache_pos=None, train=False):
    """LlamaAttention.forward (modeling_llama_quant.py:303-392), GQA-ready.

    cache: optional dict(k=[B, S, KVH, D], v=[B, S, KVH, D]) updated in place
    at cache_pos (static-shape decode). Returns (out, new_cache).
    """
    b, t, h = x.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    if "qkv_proj" in layer:
        qkv = quant_linear(x, layer["qkv_proj"], cfg, train)
        q = qkv[..., : nh * d]
        k = qkv[..., nh * d: (nh + nkv) * d]
        v = qkv[..., (nh + nkv) * d:]
    else:
        q = quant_linear(x, layer["q_proj"], cfg, train)
        k = quant_linear(x, layer["k_proj"], cfg, train)
        v = quant_linear(x, layer["v_proj"], cfg, train)

    # KV fake-quant before reshaping (modeling_llama_quant.py:323-329)
    if cfg.kv_bits < 32:
        k = scheme.sym_fake_quant_ste(k, cfg.kv_bits, groupsize=128)
        v = scheme.sym_fake_quant_ste(v, cfg.kv_bits, groupsize=128)

    q = q.reshape(b, t, nh, d)
    k = k.reshape(b, t, nkv, d)
    v = v.reshape(b, t, nkv, d)
    q, k = apply_rope(q, k, cos, sin)

    # Cached PREFILL at position 0 only sees this chunk's own keys, so
    # attention can run flash over the fresh [B,T,H,D] k/v — never reading
    # the (mostly empty) [B,S,...] cache back (round-1 weak spot: engine
    # prefill materialized full T x S f32 score tensors).
    prefill_flash = (cache is not None and t >= 128
                     and isinstance(cache_pos, int) and cache_pos == 0
                     and (cfg.attn_impl == "flash"
                          or (cfg.attn_impl == "auto"
                              and jax.default_backend() != "cpu")))

    if cache is not None and "layer_idx" in cache:
        # stacked-cache decode: the FULL [L, B, S, H, D] buffers ride the
        # scan carry and only the new token's slice is written — routing
        # per-layer caches through scan xs/ys re-copies the entire cache
        # every step (device-trace-verified ~3.3 ms/step on 7B decode).
        idx = cache["layer_idx"]
        quant = "k_codes" in cache
        if quant:
            # head-major int8 cache: codes [L,B,H,S,D], scales [L,B,H,S]
            from mxq_tpu.serving import kvcache as _kvc
            kc, ksc = _kvc.quantize_kv_headmajor(k)     # [B,H,T,D], [B,H,T]
            vc, vsc = _kvc.quantize_kv_headmajor(v)
            if t == 1:
                # fused decode attention consumes the int8 codes directly —
                # HBM reads stay int8 and no full-cache dequant
                # materializes (the round-1 regression, docs/RESULTS.md).
                # The write strategy (fused in-kernel / folded read /
                # layer-view) lives in attn_int8.decode_attend_update —
                # ONE dispatch shared with the engine's multipos forward;
                # the returned pend commits post-scan in forward().
                from mxq_tpu.ops import attn_int8 as _a8
                positions = jnp.full((b,), cache_pos, jnp.int32)
                ctx, new_cache, pend = _a8.decode_attend_update(
                    cache, q[:, 0], kc, ksc, vc, vsc, idx, positions)
                new_cache["pending"] = pend
                ctx = ctx.reshape(b, 1, nh * d).astype(x.dtype)
                return (quant_linear(ctx, layer["o_proj"], cfg, train),
                        new_cache)
            updc = lambda buf, val: jax.lax.dynamic_update_slice(
                buf, val[None].astype(buf.dtype), (idx, 0, 0, cache_pos, 0))
            upds = lambda buf, val: jax.lax.dynamic_update_slice(
                buf, val[None].astype(buf.dtype), (idx, 0, 0, cache_pos))
            new_cache = {"k_codes": updc(cache["k_codes"], kc),
                         "k_scale": upds(cache["k_scale"], ksc),
                         "v_codes": updc(cache["v_codes"], vc),
                         "v_scale": upds(cache["v_scale"], vsc),
                         "layer_idx": idx}
            layer_view = {kk: jax.lax.dynamic_index_in_dim(
                new_cache[kk], idx, 0, keepdims=False)
                for kk in ("k_codes", "k_scale", "v_codes", "v_scale")}
            if prefill_flash:
                # attend the kv_bits-roundtripped fresh keys (same values
                # decode will read back from the int8 cache)
                k = (kc.astype(jnp.float32)
                     * ksc.astype(jnp.float32)[..., None]
                     ).transpose(0, 2, 1, 3).astype(x.dtype)
                v = (vc.astype(jnp.float32)
                     * vsc.astype(jnp.float32)[..., None]
                     ).transpose(0, 2, 1, 3).astype(x.dtype)
            else:
                k, v = _kvc.cache_read_layer(layer_view, dtype=x.dtype)
        else:
            upd = lambda buf, val: jax.lax.dynamic_update_slice(
                buf, val[None].astype(buf.dtype), (idx, 0, cache_pos, 0, 0))
            new_cache = {"k": upd(cache["k"], k), "v": upd(cache["v"], v),
                         "layer_idx": idx}
            if not prefill_flash:
                k = jax.lax.dynamic_index_in_dim(
                    new_cache["k"], idx, 0, keepdims=False).astype(x.dtype)
                v = jax.lax.dynamic_index_in_dim(
                    new_cache["v"], idx, 0, keepdims=False).astype(x.dtype)
    elif cache is not None and "k_codes" in cache:
        # really-quantized int8 KV cache (serving path; see serving/kvcache.py)
        from mxq_tpu.serving import kvcache as _kvc
        new_cache = _kvc.cache_update_layer(cache, k, v, cache_pos)
        if prefill_flash:
            k = _kvc.dequantize_kv(*_kvc.quantize_kv(k, d), d, x.dtype)
            v = _kvc.dequantize_kv(*_kvc.quantize_kv(v, d), d, x.dtype)
        else:
            k, v = _kvc.cache_read_layer(new_cache, dtype=x.dtype)
    elif cache is not None:
        kf = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, cache_pos, 0, 0))
        vf = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, cache_pos, 0, 0))
        new_cache = {"k": kf, "v": vf}
        if not prefill_flash:
            k, v = kf, vf
    else:
        new_cache = None

    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    use_flash = (cfg.attn_impl == "flash"
                 or (cfg.attn_impl == "auto"
                     and (cache is None or prefill_flash)
                     and jax.default_backend() != "cpu" and t >= 128))
    if use_flash:
        # pallas flash attention (jax.experimental.pallas.ops.tpu):
        # online-softmax tiling, no T x S score materialization
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        ctx = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), causal=True,
            sm_scale=float(1.0 / np.sqrt(d)))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * d).astype(x.dtype)
    else:
        # softmax in f32 (modeling_llama_quant.py:375)
        qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)
        kf = k.transpose(0, 2, 1, 3).astype(jnp.float32)
        vf = v.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(d)
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(vf.dtype)
        ctx = jnp.einsum("bhts,bhsd->bhtd", probs, vf)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * d).astype(x.dtype)
    return quant_linear(ctx, layer["o_proj"], cfg, train), new_cache


def mlp(x, layer, cfg: LlamaConfig, train=False):
    """LlamaMLP (modeling_llama_quant.py:210-237): SiLU(gate) * up -> down."""
    if "gate_up_proj" in layer:
        gu = quant_linear(x, layer["gate_up_proj"], cfg, train)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = quant_linear(x, layer["gate_proj"], cfg, train)
        u = quant_linear(x, layer["up_proj"], cfg, train)
    return quant_linear(jax.nn.silu(g) * u, layer["down_proj"], cfg, train)


def decoder_layer(x, layer, cfg: LlamaConfig, cos, sin, mask, cache=None,
                  cache_pos=None, train=False):
    """LlamaDecoderLayer.forward (modeling_llama_quant.py:414-466)."""
    h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
    attn_out, new_cache = attention(h, layer, cfg, cos, sin, mask, cache,
                                    cache_pos, train)
    x = x + attn_out
    h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
    x = x + mlp(h, layer, cfg, train)
    return x, new_cache


def causal_mask(t: int, s: Optional[int] = None, offset: int = 0,
                dtype=jnp.float32) -> jax.Array:
    """[1, 1, T, S] additive causal mask (modeling_llama_quant.py:59-109).
    ``offset`` is the absolute position of query 0 (for decode)."""
    s = s if s is not None else t
    qi = jnp.arange(t)[:, None] + offset
    ki = jnp.arange(s)[None, :]
    m = jnp.where(ki <= qi, 0.0, jnp.finfo(jnp.float32).min)
    return m[None, None].astype(dtype)


def forward(params, input_ids, cfg: LlamaConfig, *, positions=None,
            caches=None, cache_pos=None, mask=None, train=False,
            remat=False):
    """Full model forward -> (logits [B, T, V], new_caches).

    ``caches``: stacked KV caches {k: [L, B, S, KVH, D], v: ...} or None.
    Layers run under lax.scan over the stacked layer params.
    """
    b, t = input_ids.shape
    x = params["embed_tokens"][input_ids]
    if positions is None:
        start = 0 if cache_pos is None else cache_pos
        positions = jnp.arange(t)[None, :] + start
        positions = jnp.broadcast_to(positions, (b, t))
    cos, sin = rope_tables(cfg, positions)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    if mask is None:
        if caches is not None:
            if "k_codes" in caches:
                s = caches["k_codes"].shape[3]      # [L, B, H, S, D]
            else:
                s = caches["k"].shape[2]            # [L, B, S, H, D]
            kpos = jnp.arange(s)[None, :]
            qpos = positions[:, :, None]
            valid = kpos[:, None, :] <= qpos
            mask = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[:, None]
        else:
            mask = causal_mask(t)

    layer_params = params["layers"]
    packed_names = [k for k, v in layer_params.items()
                    if isinstance(v, PackedMXQLinear)]
    dense_stacks = {k: v for k, v in layer_params.items()
                    if k not in packed_names}
    nl = cfg.num_hidden_layers

    def _layer_fn(x, idx, dense_sl, cache):
        layer = dict(dense_sl)
        for k in packed_names:
            # stacked packed weights stay resident; the kernel indexes them
            layer[k] = StackedPackedRef(layer_params[k], idx)
        return decoder_layer(x, layer, cfg, cos, sin, mask, cache, cache_pos,
                             train=train)

    fn = jax.checkpoint(_layer_fn) if remat else _layer_fn

    def body(carry, inputs):
        idx, dense_sl, cache = inputs
        return fn(carry, idx, dense_sl, cache)

    idxs = jnp.arange(nl, dtype=jnp.int32)
    if caches is None:
        x, _ = jax.lax.scan(
            lambda c, inp: (body(c, (inp[0], inp[1], None))[0], None),
            x, (idxs, dense_stacks))
        new_caches = None
    else:
        # stacked caches ride the CARRY; each layer writes only its one-token
        # slice in place (see the stacked-cache branch in attention()). The
        # int8 t==1 decode path writes its code rows IN-KERNEL (fused-write
        # attention, aliased outputs) and emits only the scale rows as a
        # "pending" scan OUTPUT — all layers' scales commit below in ONE
        # stacked update (the per-layer update/copy chain this replaces
        # cost ~1.1 ms of the 8.9 ms 7B decode step, r4 trace).
        def body_cached(carry, inputs):
            xc, cstate = carry
            idx, dense_sl = inputs
            xc, new_cache = fn(xc, idx, dense_sl,
                               {**cstate, "layer_idx": idx})
            pending = new_cache.pop("pending", None)
            cstate = {k2: v2 for k2, v2 in new_cache.items()
                      if k2 != "layer_idx"}
            return (xc, cstate), pending

        (x, new_caches), pend = jax.lax.scan(body_cached, (x, caches),
                                             (idxs, dense_stacks))
        if pend is not None:
            # fused-write (len 2): (ks, vs) one-token SCALE rows — the code
            # rows were written in-kernel. r3 deferred-write (len 4):
            # (kc, ks, vc, vs) codes+scales commit here in one stacked
            # update (attn_int8.WRITE_PATH selects fused/folded/deferred).
            pos = cache_pos
            updc = lambda buf, val: jax.lax.dynamic_update_slice(
                buf, val.astype(buf.dtype), (0, 0, 0, pos, 0))
            upds = lambda buf, val: jax.lax.dynamic_update_slice(
                buf, val.astype(buf.dtype), (0, 0, 0, pos))
            if len(pend) == 2:
                ks, vs = pend
                new_caches = {**new_caches,
                              "k_scale": upds(new_caches["k_scale"], ks),
                              "v_scale": upds(new_caches["v_scale"], vs)}
            else:
                kc, ks, vc, vs = pend
                new_caches = {"k_codes": updc(new_caches["k_codes"], kc),
                              "k_scale": upds(new_caches["k_scale"], ks),
                              "v_codes": updc(new_caches["v_codes"], vc),
                              "v_scale": upds(new_caches["v_scale"], vs)}

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        logits = x @ params["embed_tokens"].T
    elif type(head).__name__ == "PackedU4Linear":
        # packed uniform-4b lm_head (serving option, EngineConfig
        # .lm_head_bits=4): vocab-matmul weight bytes drop 4x (the
        # reference never quantizes lm_head — modeling_llama_quant.py
        # wraps only the decoder projections — so this is opt-in)
        from mxq_tpu.ops import uniform4
        logits = uniform4.u4_matmul(x, head)
    else:
        logits = x @ head
    return logits.astype(jnp.float32), new_caches


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> dict:
    l = cfg.num_hidden_layers
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    shape = (l, batch, max_len, kvh, d)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Shifted CE loss (modeling_llama_quant.py:887-897)."""
    logits = logits[:, :-1]
    labels = labels[:, 1:]
    valid = labels != ignore_index
    labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def sequence_classification_forward(params, input_ids, cfg: LlamaConfig,
                                    num_labels: int, pad_token_id: int = 0):
    """LlamaForSequenceClassification (modeling_llama_quant.py:972-1092):
    score head on the LAST non-pad token's hidden state. ``params`` must hold
    a "score" head [hidden, num_labels] (no bias)."""
    b, t = input_ids.shape
    x = params["embed_tokens"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_tables(cfg, positions)
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    mask = causal_mask(t)

    layer_params = params["layers"]

    def body(carry, layer):
        out, _ = decoder_layer(carry, layer, cfg, cos, sin, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, layer_params)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = x @ params["score"]                      # [B, T, num_labels]
    # last non-pad position per row (modeling_llama_quant.py:1047-1056)
    nonpad = (input_ids != pad_token_id).astype(jnp.int32)
    last = jnp.maximum(jnp.sum(nonpad, axis=-1) - 1, 0)
    return jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0]
