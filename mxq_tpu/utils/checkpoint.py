"""Model artifact serialization.

Two artifact kinds, fixing the reference's gap (SURVEY.md §5: "packed low-bit
serialization does not exist" — the reference could only save_pretrained the
quant-dequant fp16 model, mxq_quant/main.py:96-100):

* dense params (fp or quant-dequant) — orbax StandardSave
* packed params — the PackedMXQLinear pytrees serialize the same way (their
  leaves are plain arrays; static fields live in the saved config json)
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.packfmt import PackedMXQLinear


def _cfg_to_json(cfg: llama.LlamaConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["scheme"] = dataclasses.asdict(cfg.scheme)
    return d


def _cfg_from_json(d: dict) -> llama.LlamaConfig:
    from mxq_tpu.config import MXQConfig
    d = dict(d)
    d["scheme"] = MXQConfig(**d["scheme"])
    return llama.LlamaConfig(**d)


def _packed_meta(params) -> dict:
    meta = {}
    layers = params.get("layers", {})
    for name, v in layers.items():
        if isinstance(v, PackedMXQLinear):
            meta[name] = {"in_features": v.in_features,
                          "out_features": v.out_features}
    return meta


def save_params(path: str, params, cfg: llama.LlamaConfig) -> None:
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    meta = _packed_meta(params)

    # strip packed dataclasses to plain dicts for orbax
    def strip(x):
        if isinstance(x, PackedMXQLinear):
            return {f.name: getattr(x, f.name)
                    for f in dataclasses.fields(x)
                    if not f.metadata.get("static")}
        return x

    layers = {k: strip(v) for k, v in params.get("layers", {}).items()}
    to_save = dict(params)
    to_save["layers"] = layers

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "state")), to_save,
               force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "mxq_config.json"), "w") as f:
        json.dump({"config": _cfg_to_json(cfg), "packed": meta}, f, indent=2)


def load_params(path: str):
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "mxq_config.json")) as f:
        info = json.load(f)
    cfg = _cfg_from_json(info["config"])
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.abspath(os.path.join(path, "state")))
    for name, m in info["packed"].items():
        d = params["layers"][name]
        params["layers"][name] = PackedMXQLinear(
            in_features=m["in_features"], out_features=m["out_features"], **d)
    return cfg, params
