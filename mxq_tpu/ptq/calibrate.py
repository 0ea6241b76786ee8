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
    # samples per device pass. None = all nsamples in one jit (the r1/r2
    # behavior: fastest, but holds every linear's activations at once —
    # ~4 GB + spikes at 7B). A small chunk bounds activation residency to
    # chunk-sized tensors: the column stats accumulate across chunks
    # BEFORE quantization, then the quantized layer re-forwards chunk by
    # chunk (two passes; the reference also forwards twice —
    # prune.py:389-404 hooks then :416-422 re-forward).
    chunk: Optional[int] = None


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


# ---- chunked / sharded variant: bounded activation residency ----

@partial(jax.jit, static_argnames=("cfg",))
def _layer_colsq_chunk(x, layer, cos, sin, mask, cfg: llama.LlamaConfig):
    """Per-linear column sum-of-squares for ONE calibration chunk (the
    accumulable form of the reference's H-diagonal, mxqgpt.py:369-383)."""
    inputs = _layer_linear_inputs(x, layer, cfg, cos, sin, mask)
    return {name: _col_sq(inputs[name]) for name in llama.LAYER_LINEARS}


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _quant_layer_weights(layer, colsq, cfg: llama.LlamaConfig, mode: str):
    new_layer = dict(layer)
    packed_layer = {}
    for name in llama.LAYER_LINEARS:
        wdq, packed = _quant_weight(layer[name], colsq[name], cfg.scheme,
                                    mode)
        new_layer[name] = wdq
        if packed is not None:
            packed_layer[name] = packed
    return new_layer, packed_layer


@partial(jax.jit, static_argnames=("cfg",))
def _layer_forward_chunk(x, layer, cos, sin, mask, cfg: llama.LlamaConfig):
    out, _ = llama.decoder_layer(
        x, layer, dataclasses.replace(cfg, w_bits=32, a_bits=32, kv_bits=32),
        cos, sin, mask)
    return out


def _put_layer(layer: dict, mesh):
    """Shard one layer's weights over the mesh: column-parallel linears
    split out-features on tp (in on fsdp), row-parallel the transpose —
    the single-layer form of parallel.sharding.LAYER_SPECS. This is what
    lets 13B/70B layers calibrate without one chip holding the full
    [in, out] f32 weight (the reference spans GPUs with hf_device_map
    moves instead, prune.py:371-379)."""
    from jax.sharding import NamedSharding
    from mxq_tpu.parallel import sharding as shlib

    out = {}
    for k, v in layer.items():
        spec = shlib.LAYER_SPECS.get(k)
        if spec is not None and getattr(v, "ndim", 0) == 2:
            spec = jax.sharding.PartitionSpec(*spec[1:])
        elif spec is not None:
            spec = jax.sharding.PartitionSpec()
        else:
            spec = jax.sharding.PartitionSpec()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def ptq_quantize(params: dict, cfg: llama.LlamaConfig, input_ids: jax.Array,
                 ptq: PTQConfig = PTQConfig(),
                 progress: Optional[Callable[[int], None]] = None,
                 mesh=None):
    """Run the full layer-sequential PTQ. ``input_ids``: [nsamples, seqlen]
    calibration batch.

    Returns ``(qparams, packed_params)``: params with quant-dequantized
    projections, and — in mode="packed" — a params pytree whose projections
    are stacked PackedMXQLinear artifacts ready for the serving path
    (None in mode="reference").

    ``mesh``: shard the calibration over devices — activations over the
    mesh's data axes (batch dim), each layer's weights over (fsdp, tp) —
    so neither the [nsamples, seqlen, hidden] activations nor a 70B
    layer's f32 weights must fit one chip. ``ptq.chunk`` additionally
    bounds residency to chunk-sized activations (see PTQConfig).

    Memory budget (f32): activations chunk*seqlen*max(H, I)*4 bytes per
    linear input; weights H*I*4/(fsdp*tp) per device. Llama-2-70B
    (H=8192, I=28672, seqlen 2048, nsamples 128): chunk=8 keeps the
    largest activation at 1.9 GB and tp=8 keeps the largest weight shard
    at 118 MB — comfortably inside a 16 GB chip, vs ~17 GB unsharded
    unchunked."""
    s, t = input_ids.shape
    x = params["embed_tokens"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(t)[None], (s, t))
    cos, sin = llama.rope_tables(cfg, positions)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    mask = llama.causal_mask(t, dtype=jnp.float32)

    batch_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mxq_tpu.parallel import sharding as shlib
        data_axes = shlib.batch_spec(mesh)
        batch_sh = NamedSharding(mesh, P(*data_axes, None, None))
        x = jax.device_put(x, batch_sh)

    nl = cfg.num_hidden_layers
    stacked = params["layers"]
    new_stacks = {k: [] for k in stacked}
    packed_stacks = {k: [] for k in llama.LAYER_LINEARS}
    chunk = ptq.chunk or s
    chunk = min(chunk, s)
    for i in range(nl):
        layer = {k: v[i] for k, v in stacked.items()}
        if mesh is not None:
            layer = _put_layer(layer, mesh)
        if chunk >= s and mesh is None:
            new_layer, packed_layer, x = _quantize_one_layer(
                x, layer, cos, sin, mask, cfg, ptq.mode)
        else:
            # pass 1: accumulate column stats chunk by chunk
            colsq = None
            for c0 in range(0, s, chunk):
                cs = _layer_colsq_chunk(x[c0:c0 + chunk], layer,
                                        cos[c0:c0 + chunk],
                                        sin[c0:c0 + chunk], mask, cfg)
                colsq = cs if colsq is None else jax.tree_util.tree_map(
                    jnp.add, colsq, cs)
            # quantize against the full-batch stats
            new_layer, packed_layer = _quant_layer_weights(
                layer, colsq, cfg, ptq.mode)
            # pass 2: re-forward through the quantized layer
            outs = [_layer_forward_chunk(x[c0:c0 + chunk], new_layer,
                                         cos[c0:c0 + chunk],
                                         sin[c0:c0 + chunk], mask, cfg)
                    for c0 in range(0, s, chunk)]
            x = jnp.concatenate(outs, axis=0)
            if batch_sh is not None:
                x = jax.device_put(x, batch_sh)
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
