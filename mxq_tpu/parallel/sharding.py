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
    """Single-host (ICI-only) mesh. For the cross-host (DCN) axis use
    parallel.multihost.make_hybrid_mesh, which layers a "dcn" axis over
    these three; every function here accepts either mesh shape."""
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
    # fused serving-path linears (quantize_params_packed(fuse=True)) are
    # column-parallel like their parts. NOTE: absent from this table until
    # round 3, fused packed weights silently got P() — fully REPLICATED —
    # so the round-2 "tp-sharded packed serving" dryrun only sharded
    # o_proj/down_proj.
    "qkv_proj": _COL, "gate_up_proj": _COL,
    "o_proj": _ROW, "down_proj": _ROW,
    "input_layernorm": P(None, None),
    "post_attention_layernorm": P(None, None),
}

_LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj", "qkv_proj", "gate_up_proj")

# Packed MXQ leaves are all [K-ish, N] with N = out-features on the lane
# axis: shard N on tp for column-parallel linears; for row-parallel linears
# the contraction dim K is packed into words — shard N on fsdp only.
_PACKED_COL = P(None, None, "tp")
_PACKED_ROW = P(None, None, "fsdp")


def _wrap_axis(spec: P, axis: str) -> P:
    """Replace mesh-axis name ``axis`` in ``spec`` with ("dcn", axis) —
    i.e. extend that sharding dimension across hosts."""
    def wrap(entry):
        if entry == axis:
            return ("dcn", axis)
        if isinstance(entry, tuple) and axis in entry:
            return tuple(a for e in entry for a in
                         (("dcn", e) if e == axis else (e,)))
        return entry
    return P(*(wrap(e) for e in spec))


def param_specs(params: dict, packed: bool = False,
                dcn_role: str | None = None) -> dict:
    """PartitionSpec pytree matching ``params`` structure.

    ``dcn_role`` decides what the cross-host mesh axis (if any) carries:
      None   — params replicated across hosts (data parallel over DCN; the
               batch covers dcn via multihost.batch_spec). The reference's
               8-GPU FSDP maps here when hosts = data-parallel replicas.
      "fsdp" — ZeRO-3 across hosts too: every fsdp-sharded dim shards over
               ("dcn","fsdp"); params all-gather over DCN each layer —
               only sane with good DCN, but it is what frees HBM fastest.
      "tp"   — tensor parallel across hosts: the 70B-serving config
               (BASELINE.json) where one host cannot hold the weights.
    """
    assert dcn_role in (None, "fsdp", "tp"), dcn_role

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        spec = None
        if "embed_tokens" in keys:
            spec = P("tp", "fsdp")
        elif "lm_head" in keys:
            spec = P("fsdp", "tp")
        elif "norm" in keys:
            spec = P(None)
        else:
            for name, s in LAYER_SPECS.items():
                if name in keys:
                    if (name in _LINEAR_NAMES and leaf.ndim == 3
                            and not packed):
                        spec = s
                    elif name in _LINEAR_NAMES and packed:
                        spec = _PACKED_COL if s is _COL else _PACKED_ROW
                    else:
                        spec = s
                    break
        if spec is None:
            spec = P()
        if dcn_role is not None:
            wrapped = _wrap_axis(spec, dcn_role)
            if wrapped == spec and dcn_role == "tp" \
                    and spec == _PACKED_ROW:
                # packed row-parallel linears (o_proj/down_proj) carry their
                # only sharded dim (N) on fsdp — under cross-host tensor
                # parallelism they must still spread over hosts, else ~45%
                # of the packed bytes replicate per host and the 70B
                # "weights exceed one host" config OOMs
                wrapped = _wrap_axis(spec, "fsdp")
            spec = wrapped
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: dict, mesh: Mesh, packed: bool = False,
                 dcn_role: str | None = None) -> dict:
    if dcn_role is not None:
        assert "dcn" in mesh.axis_names, "dcn_role needs a hybrid mesh"
    specs = param_specs(params, packed, dcn_role)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_spec(mesh: Optional[Mesh] = None) -> P:
    if mesh is not None and "dcn" in mesh.axis_names:
        from mxq_tpu.parallel import multihost
        return multihost.batch_spec(mesh)
    return P(("dp", "fsdp"))


def shard_batch(batch, mesh: Mesh):
    """Shard a (host-resident, fully materialized) batch over the mesh's
    data axes. Multi-process runs should feed per-host slices through
    multihost.global_batch instead; this path assumes the whole batch is
    present locally (single-process / tests)."""
    spec = batch_spec(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec)), batch)
