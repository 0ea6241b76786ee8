"""Really-quantized KV cache for serving.

The reference only FAKE-quantizes K/V during QAT (SymQuantizer at kv_bits,
modeling_llama_quant.py:323-329) and stores the cache in fp
(modeling_llama_quant.py:347-352, plain tuple concat). Here the serving cache
stores int8 codes + per-(token, head, group) bf16 scales — the same symmetric
groupwise scheme (group = head_dim by default), executed for real: ~2x HBM
saving over bf16 and ~4x over fp32, which is what decode bandwidth buys.

Layout: codes [L, B, S, H, D] int8, scales [L, B, S, H, D // group] bf16.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_quant_cache(num_layers: int, batch: int, max_len: int, kv_heads: int,
                     head_dim: int, group: int | None = None) -> dict:
    """Plain-dict pytree so lax.scan slices it per layer (models.llama.forward
    detects quantized caches by the "k_codes" key)."""
    g = group or head_dim
    code_shape = (num_layers, batch, max_len, kv_heads, head_dim)
    scale_shape = (num_layers, batch, max_len, kv_heads, head_dim // g)
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


def cache_update_layer(cache_layer: dict, k_new: jax.Array, v_new: jax.Array,
                       pos, group: int) -> dict:
    """Write [B, T, H, D] new K/V at position ``pos`` (quantizing)."""
    kc, ks = quantize_kv(k_new, group)
    vc, vs = quantize_kv(v_new, group)
    upd = lambda buf, val: jax.lax.dynamic_update_slice(
        buf, val.astype(buf.dtype), (0, pos) + (0,) * (buf.ndim - 2))
    return {
        "k_codes": upd(cache_layer["k_codes"], kc),
        "k_scale": upd(cache_layer["k_scale"], ks),
        "v_codes": upd(cache_layer["v_codes"], vc),
        "v_scale": upd(cache_layer["v_scale"], vs),
    }


def cache_read_layer(cache_layer: dict, group: int, dtype=jnp.bfloat16):
    k = dequantize_kv(cache_layer["k_codes"], cache_layer["k_scale"], group,
                      dtype)
    v = dequantize_kv(cache_layer["v_codes"], cache_layer["v_scale"], group,
                      dtype)
    return k, v
