"""Layer-sequential post-training quantization — the TPU rebuild of
``nas_quant`` (mxq_quant/lib/prune.py:326-425) + ``MXQGPT`` (lib/mxqgpt.py).

The reference's flow: hijack layer 0 to capture calibration inputs, then per
decoder layer: wrap each nn.Linear, forward-hook activation stats, RTN-quantize
the weight (Hessian collected but only its zero diagonal is used, to zero dead
columns — mxqgpt.py:401-403), re-forward to produce the next layer's inputs.

Here the same schedule is a jitted per-layer function over the stacked layer
params: no hooks, no hijacking — the layer's internal activations (inputs of
each of the 7 linears) are computed directly, column L2 stats replace diag(H)
(equivalent for the dead-column test), and the quantized layer is re-applied
to produce the next layer's inputs. Runs entirely on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mxq_tpu import scheme, packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.models import llama


@dataclasses.dataclass(frozen=True)
class PTQConfig:
    mode: str = "reference"   # "reference" (fp zeros, parity with mxqgpt) or
                              # "packed" (integer zeros, packable artifact)
    nsamples: int = 128       # prune.py:329
    seqlen: int = 2048        # model.seqlen, main.py:26


def _quant_weight(w_io: jax.Array, col_sq: jax.Array, cfg: MXQConfig,
                  mode: str):
    """Quant-dequant one [in, out] weight; zero dead input columns first
    (mxqgpt.py:401-403: W[:, dead] = 0 where diag(H)==0).

    Returns (dequantized weight, packed artifact or None). The packed
    artifact comes from the SAME quantization pass — asymmetric quant-dequant
    is not a fixed point, so re-quantizing the dequantized weights later
    would not reproduce the same codes."""
    dead = (col_sq == 0.0)[:, None]
    w_io = jnp.where(dead, 0.0, w_io)
    if mode == "reference":
        return scheme.mxq_fake_quant_ptq(w_io.T, cfg).T.astype(w_io.dtype), None
    packed = packfmt.quantize_pack(w_io.T, cfg)
    return packfmt.unpack_dequant(packed, cfg).astype(w_io.dtype), packed


def _layer_linear_inputs(x, layer, cfg: llama.LlamaConfig, cos, sin, mask):
    """The activations feeding each of the 7 linears of one decoder layer,
    given the layer input x (what the reference's forward hooks capture,
    prune.py:389-404)."""
    h1 = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
    b, t, _ = x.shape
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    q = (h1 @ layer["q_proj"]).reshape(b, t, nh, d)
    k = (h1 @ layer["k_proj"]).reshape(b, t, nkv, d)
    v = (h1 @ layer["v_proj"]).reshape(b, t, nkv, d)
    q, k = llama.apply_rope(q, k, cos, sin)
    if nkv != nh:
        k = jnp.repeat(k, nh // nkv, axis=2)
        v = jnp.repeat(v, nh // nkv, axis=2)
    import numpy as np
    qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kf = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    scores = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(d)
    probs = jax.nn.softmax(scores + mask, axis=-1)
    ctx = jnp.einsum("bhts,bhsd->bhtd", probs,
                     v.transpose(0, 2, 1, 3).astype(jnp.float32))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * d).astype(x.dtype)
    attn_out = ctx @ layer["o_proj"]
    x2 = x + attn_out
    h2 = llama.rms_norm(x2, layer["post_attention_layernorm"], cfg.rms_norm_eps)
    g = h2 @ layer["gate_proj"]
    u = h2 @ layer["up_proj"]
    act = jax.nn.silu(g) * u
    return {"q_proj": h1, "k_proj": h1, "v_proj": h1, "o_proj": ctx,
            "gate_proj": h2, "up_proj": h2, "down_proj": act}


def _col_sq(acts: jax.Array) -> jax.Array:
    """Per-input-column sum of squares (= diag of the reference's H up to the
    2/n factor, mxqgpt.py:369-383)."""
    flat = acts.reshape(-1, acts.shape[-1]).astype(jnp.float32)
    return jnp.sum(flat * flat, axis=0)


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _quantize_one_layer(x, layer, cos, sin, mask, cfg: llama.LlamaConfig,
                        mode: str):
    """Quantize the 7 linears of one layer against its calibration inputs and
    return (quantized layer params, layer outputs) — one step of the
    sequential loop (prune.py:369-422)."""
    inputs = _layer_linear_inputs(x, layer, cfg, cos, sin, mask)
    new_layer = dict(layer)
    packed_layer = {}
    for name in llama.LAYER_LINEARS:
        wdq, packed = _quant_weight(layer[name], _col_sq(inputs[name]),
                                    cfg.scheme, mode)
        new_layer[name] = wdq
        if packed is not None:
            packed_layer[name] = packed
    out, _ = llama.decoder_layer(
        x, new_layer, dataclasses.replace(cfg, w_bits=32, a_bits=32,
                                          kv_bits=32),
        cos, sin, mask)
    return new_layer, packed_layer, out


def ptq_quantize(params: dict, cfg: llama.LlamaConfig, input_ids: jax.Array,
                 ptq: PTQConfig = PTQConfig(),
                 progress: Optional[Callable[[int], None]] = None):
    """Run the full layer-sequential PTQ. ``input_ids``: [nsamples, seqlen]
    calibration batch.

    Returns ``(qparams, packed_params)``: params with quant-dequantized
    projections, and — in mode="packed" — a params pytree whose projections
    are stacked PackedMXQLinear artifacts ready for the serving path
    (None in mode="reference").
    """
    s, t = input_ids.shape
    x = params["embed_tokens"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(t)[None], (s, t))
    cos, sin = llama.rope_tables(cfg, positions)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    mask = llama.causal_mask(t, dtype=jnp.float32)

    nl = cfg.num_hidden_layers
    stacked = params["layers"]
    new_stacks = {k: [] for k in stacked}
    packed_stacks = {k: [] for k in llama.LAYER_LINEARS}
    for i in range(nl):
        layer = {k: v[i] for k, v in stacked.items()}
        new_layer, packed_layer, x = _quantize_one_layer(
            x, layer, cos, sin, mask, cfg, ptq.mode)
        for k in stacked:
            new_stacks[k].append(new_layer[k])
        for k, v in packed_layer.items():
            packed_stacks[k].append(v)
        if progress is not None:
            progress(i)

    out = dict(params)
    out["layers"] = {k: jnp.stack(v) for k, v in new_stacks.items()}
    packed_out = None
    if ptq.mode == "packed":
        packed_layers = dict(out["layers"])
        for k, v in packed_stacks.items():
            packed_layers[k] = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *v)
        packed_out = dict(out)
        packed_out["layers"] = packed_layers
    return out, packed_out
