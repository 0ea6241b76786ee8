"""Device-mesh sharding for mxq-tpu: the TPU-native replacement for the
reference's torch FSDP / NCCL stack (LLM-QAT/utils/kd_trainer.py:172-277,
train.py:46) and its `device_map=auto` layer spill (mxq_quant/main.py:23).

One mesh, three logical axes:
  * ``dp``   — pure data parallel (batch replicated weights)
  * ``fsdp`` — weight-sharded data parallel (ZeRO-3 analogue of the
               reference's torch FSDP full_shard, run_train.sh:44-45); params
               shard along their first (in-features / stacked-layer-minor)
               dimension, gradients reduce-scatter automatically via GSPMD
  * ``tp``   — tensor parallel (Megatron-style column/row split of the 7
               projections; no reference counterpart — the reference has no
               TP at all, SURVEY.md §2.5)

Instead of wrapping modules (FSDP auto_wrap), we annotate the parameter
pytree with NamedSharding and let GSPMD insert all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mxq_tpu.models import llama


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * fsdp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


# Per-parameter PartitionSpec for the stacked-layer Llama pytree.
# Linear weights are [L, in, out]:
#   column-parallel (q/k/v/gate/up): out on tp, in on fsdp
#   row-parallel (o/down):           in on tp, out on fsdp
_COL = P(None, "fsdp", "tp")
_ROW = P(None, "tp", "fsdp")

LAYER_SPECS = {
    "q_proj": _COL, "k_proj": _COL, "v_proj": _COL,
    "gate_proj": _COL, "up_proj": _COL,
    "o_proj": _ROW, "down_proj": _ROW,
    "input_layernorm": P(None, None),
    "post_attention_layernorm": P(None, None),
}

# Packed MXQ leaves are all [K-ish, N] with N = out-features on the lane
# axis: shard N on tp for column-parallel linears; for row-parallel linears
# the contraction dim K is packed into words — shard N on fsdp only.
_PACKED_COL = P(None, None, "tp")
_PACKED_ROW = P(None, None, "fsdp")


def param_specs(params: dict, packed: bool = False) -> dict:
    """PartitionSpec pytree matching ``params`` structure."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "embed_tokens" in keys:
            return P("tp", "fsdp")
        if "lm_head" in keys:
            return P("fsdp", "tp")
        if "norm" in keys:
            return P(None)
        for name, spec in LAYER_SPECS.items():
            if name in keys:
                if name in llama.LAYER_LINEARS and leaf.ndim == 3 and not packed:
                    return spec
                if name in llama.LAYER_LINEARS and packed:
                    return (_PACKED_COL if spec is _COL else _PACKED_ROW)
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: dict, mesh: Mesh, packed: bool = False) -> dict:
    specs = param_specs(params, packed)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_spec() -> P:
    return P(("dp", "fsdp"))


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec())), batch)
