"""Really-quantized KV cache for serving.

The reference only FAKE-quantizes K/V during QAT (SymQuantizer at kv_bits,
modeling_llama_quant.py:323-329) and stores the cache in fp
(modeling_llama_quant.py:347-352, plain tuple concat). Here the serving cache
stores int8 codes + per-(token, head) bf16 scales — the same symmetric
groupwise scheme (group = head_dim), executed for real: ~2x HBM saving over
bf16 and ~4x over fp32, which is what decode bandwidth buys.

Layout (head-major, the fused-attention kernel's contract —
ops/attn_int8.py): codes [L, B, H, S, D] int8, scales [L, B, H, S] bf16.
Head-major makes each (batch, head) slice a dense [S, D] block so the
decode-attention kernel DMAs codes straight from HBM without a gather;
the per-token scale factors out of both attention dots (see attn_int8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_quant_cache(num_layers: int, batch: int, max_len: int, kv_heads: int,
                     head_dim: int, group: int | None = None) -> dict:
    """Plain-dict pytree so lax.scan slices it per layer (models.llama.forward
    detects quantized caches by the "k_codes" key). ``group`` must equal
    ``head_dim`` (the kernel contract); the parameter survives for API
    compatibility."""
    g = group or head_dim
    if g != head_dim:
        raise ValueError(f"serving cache requires group == head_dim "
                         f"({g} != {head_dim})")
    code_shape = (num_layers, batch, kv_heads, max_len, head_dim)
    scale_shape = (num_layers, batch, kv_heads, max_len)
    # distinct buffers (donation forbids aliased arguments)
    return {"k_codes": jnp.zeros(code_shape, jnp.int8),
            "k_scale": jnp.zeros(scale_shape, jnp.bfloat16),
            "v_codes": jnp.zeros(code_shape, jnp.int8),
            "v_scale": jnp.zeros(scale_shape, jnp.bfloat16)}


def quantize_kv(x: jax.Array, group: int) -> Tuple[jax.Array, jax.Array]:
    """[..., D] -> int8 codes [..., D], bf16 scales [..., D//G].
    Symmetric max-abs per group (SymQuantizer semantics, utils_quant.py:57)."""
    shape = x.shape
    g = x.reshape(shape[:-1] + (shape[-1] // group, group)).astype(jnp.float32)
    m = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    s = m / 127.0
    codes = jnp.round(g / jnp.maximum(s, 1e-8)).astype(jnp.int8)
    return (codes.reshape(shape),
            s[..., 0].astype(jnp.bfloat16))


def dequantize_kv(codes: jax.Array, scales: jax.Array, group: int,
                  dtype=jnp.bfloat16) -> jax.Array:
    shape = codes.shape
    c = codes.reshape(shape[:-1] + (shape[-1] // group, group)).astype(jnp.float32)
    out = c * scales.astype(jnp.float32)[..., None]
    return out.reshape(shape).astype(dtype)


def quantize_kv_headmajor(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, T, H, D] time-major K/V -> codes [B, H, T, D] int8,
    scales [B, H, T] bf16 (group == head_dim)."""
    xt = x.transpose(0, 2, 1, 3)
    codes, scales = quantize_kv(xt, xt.shape[-1])
    return codes, scales[..., 0]


def cache_update_layer(cache_layer: dict, k_new: jax.Array, v_new: jax.Array,
                       pos, group: int | None = None) -> dict:
    """Write [B, T, H, D] new K/V at sequence position ``pos`` (quantizing).
    ``cache_layer`` holds per-layer head-major buffers: codes [B, H, S, D],
    scales [B, H, S]."""
    kc, ks = quantize_kv_headmajor(k_new)
    vc, vs = quantize_kv_headmajor(v_new)

    def upd_codes(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, 0, pos, 0))

    def upd_scale(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, 0, pos))

    return {
        "k_codes": upd_codes(cache_layer["k_codes"], kc),
        "k_scale": upd_scale(cache_layer["k_scale"], ks),
        "v_codes": upd_codes(cache_layer["v_codes"], vc),
        "v_scale": upd_scale(cache_layer["v_scale"], vs),
    }


def cache_read_layer(cache_layer: dict, group: int | None = None,
                     dtype=jnp.bfloat16):
    """Dequantize a per-layer head-major cache back to time-major
    k, v: [B, S, H, D] (the generic attention path's layout)."""
    def rd(codes, scales):
        out = codes.astype(jnp.float32) * scales.astype(jnp.float32)[..., None]
        return out.transpose(0, 2, 1, 3).astype(dtype)

    k = rd(cache_layer["k_codes"], cache_layer["k_scale"])
    v = rd(cache_layer["v_codes"], cache_layer["v_scale"])
    return k, v
