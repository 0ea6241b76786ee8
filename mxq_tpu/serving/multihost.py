"""Multi-host serving driver: one continuous-batching engine spanning hosts.

JAX is multi-controller — every host runs this same loop in lockstep; the
compiled prefill/decode programs operate on globally-sharded arrays (weights
tensor-parallel over ICI and, for models that exceed one host's HBM, over
("dcn","tp"); KV cache sharded on the heads axis so each host holds only its
own heads' cache). What must stay IDENTICAL across hosts is the host-side
scheduler state, which is driven entirely by (a) the request stream and
(b) device-computed tokens. (b) is identical everywhere by construction
(same compiled program, same sharded arrays); (a) is made identical by
funneling submissions through the coordinator: host 0 accepts requests and
broadcasts (uid, prompt, max_new, eos) to all hosts before anyone admits —
"host-0 scheduling". The reference has no serving counterpart at all
(SURVEY.md §0.3); its closest capability is device_map layer spill
(mxq_quant/main.py:23), which this replaces with real tensor sharding.

Single-process is the degenerate case: broadcast is the identity and
MultiHostEngine behaves exactly like Engine over a hybrid mesh — which is
what tests/test_multihost.py and dryrun_multichip exercise on the 8-virtual-
device CPU mesh (dcn=2 simulated hosts).

To re-measure on real multi-host hardware: whether the per-layer tp
all-reduce rides ICI only (dcn_role=None) or DCN (dcn_role="tp"), and the
resulting tokens/s scaling efficiency vs 1 host (BASELINE.json: >=85% at
>=2 hosts).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mxq_tpu.models import llama
from mxq_tpu.parallel import multihost, sharding
from mxq_tpu.serving.engine import Engine, EngineConfig, Request


def kv_cache_spec(caches: dict, dcn_role: Optional[str] = None) -> dict:
    """Head-sharded KV specs. bf16 cache: {k,v} [L, B, S, H, D] (heads axis
    3); int8 quant cache: codes [L, B, H, S, D] / scales [L, B, H, S]
    (heads axis 2). Sharding the heads axis over tp keeps each host's
    attention reads local — decode attention has no cross-head reduction."""
    tp = ("dcn", "tp") if dcn_role == "tp" else "tp"

    def spec_for(name, leaf):
        if name in ("k", "v"):
            return P(None, None, None, tp, None)
        if name.endswith("_codes"):
            return P(None, None, tp, None, None)
        if name.endswith("_scale"):
            return P(None, None, tp, None)
        return P()

    return {k: spec_for(k, v) for k, v in caches.items()}


def shard_engine(engine: Engine, mesh: Mesh,
                 dcn_role: Optional[str] = None) -> Engine:
    """Re-place an engine's params (packed or dense) and KV cache onto the
    mesh: weights per sharding.param_specs (tp column/row split; dcn_role
    "tp" extends the split across hosts for the 70B config), cache
    head-sharded. In-place on the engine; returns it for chaining."""
    packed = _params_are_packed(engine.params)
    engine.params = sharding.shard_params(engine.params, mesh, packed=packed,
                                          dcn_role=dcn_role)
    specs = kv_cache_spec(engine.caches, dcn_role)
    engine.caches = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
                     for k, v in engine.caches.items()}
    return engine


def _params_are_packed(params) -> bool:
    from mxq_tpu.packfmt import PackedMXQLinear
    return any(isinstance(v, PackedMXQLinear)
               for v in params.get("layers", {}).values())


class MultiHostEngine:
    """Engine wrapper with coordinator-funneled submission.

    On every host: construct with the same (params, cfg, ecfg, mesh); call
    submit() ONLY on the coordinator (other hosts pass None and receive the
    broadcast); call pump()/run() on all hosts each iteration.
    """

    def __init__(self, params, cfg: llama.LlamaConfig, mesh: Mesh,
                 ecfg: EngineConfig = EngineConfig(kv_quant=False),
                 dcn_role: Optional[str] = None):
        # int8-KV uses a single-chip Pallas attention kernel; sharding its
        # code/scale cache over the mesh would make GSPMD all-gather the
        # full cache per device (or fail to partition) — refuse rather
        # than silently blow up memory at pod scale. bf16 KV shards fine.
        assert not ecfg.kv_quant, (
            "MultiHostEngine requires kv_quant=False: the fused int8-KV "
            "attention kernel is single-chip (shard it via shard_map "
            "before enabling)")
        self.engine = shard_engine(Engine(params, cfg, ecfg), mesh,
                                   dcn_role)
        self.mesh = mesh

    def submit(self, prompt: Optional[np.ndarray],
               max_new_tokens: int = 64,
               eos_token_id: Optional[int] = None) -> Optional[Request]:
        """Collective: every host calls this together; only the
        coordinator's arguments are used (others may pass prompt=None).
        Returns the Request on every host (same uid everywhere)."""
        if jax.process_count() == 1:
            return self.engine.submit(prompt, max_new_tokens, eos_token_id)
        from jax.experimental import multihost_utils
        # fixed-size header then the padded prompt: every host must run the
        # same number of broadcasts, so length travels in the header
        if multihost.is_coordinator():
            pr = np.asarray(prompt, np.int32)
            hdr = np.array([len(pr), max_new_tokens,
                            -1 if eos_token_id is None else eos_token_id],
                           np.int32)
        else:
            hdr = np.zeros(3, np.int32)
        hdr = np.asarray(multihost_utils.broadcast_one_to_all(hdr))
        buf = np.zeros(max(int(hdr[0]), 1), np.int32)
        if multihost.is_coordinator():
            buf[:len(pr)] = pr
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        eos = int(hdr[2])
        return self.engine.submit(buf[:int(hdr[0])], int(hdr[1]),
                                  None if eos < 0 else eos)

    def run(self) -> list:
        return self.engine.run()

    def stream(self, **kw):
        return self.engine.stream(**kw)

    def stats(self) -> dict:
        return self.engine.stats()
