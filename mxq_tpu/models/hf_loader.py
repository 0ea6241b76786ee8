"""HuggingFace Llama checkpoint loader: safetensors -> mxq_tpu params pytree.

The reference consumes HF checkpoints via transformers
(``LlamaForCausalLM.from_pretrained``, LLM-QAT/train.py:53-66 and
mxq_quant/main.py:16-27); here we read the safetensors shards directly into
the functional params layout (no torch in the load path), with weights
transposed to [in, out] for x @ w.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama


def load_config(path: str) -> llama.LlamaConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    return llama.LlamaConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_hidden_layers=c["num_hidden_layers"],
        num_attention_heads=c["num_attention_heads"],
        num_key_value_heads=c.get("num_key_value_heads",
                                  c["num_attention_heads"]),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        rms_norm_eps=c.get("rms_norm_eps", 1e-6),
        rope_theta=c.get("rope_theta", 10000.0),
        tie_word_embeddings=c.get("tie_word_embeddings", False),
    )


def _open_shards(path: str):
    """Yield (name, numpy array) for every tensor across all shards."""
    from safetensors import safe_open

    idx_file = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx_file):
        with open(idx_file) as f:
            index = json.load(f)["weight_map"]
        shards = sorted(set(index.values()))
    else:
        shards = ["model.safetensors"]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_params(path: str, cfg: llama.LlamaConfig | None = None,
                dtype=jnp.bfloat16) -> Tuple[llama.LlamaConfig, dict]:
    """Load an HF Llama dir into (config, params)."""
    cfg = cfg or load_config(path)
    nl = cfg.num_hidden_layers
    shapes = llama._linear_shapes(cfg)

    layer_stacks = {name: [None] * nl for name in llama.LAYER_LINEARS}
    layer_stacks["input_layernorm"] = [None] * nl
    layer_stacks["post_attention_layernorm"] = [None] * nl
    params: dict = {"layers": layer_stacks}

    def to_jnp(a, transpose=False):
        # safetensors framework="np" yields ml_dtypes bf16 arrays for bf16
        # shards; jnp.asarray handles those directly.
        a = np.ascontiguousarray(a.T if transpose else a)
        return jnp.asarray(a).astype(dtype)

    for name, arr in _open_shards(path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = to_jnp(arr)
        elif name == "model.norm.weight":
            params["norm"] = to_jnp(arr)
        elif name == "lm_head.weight":
            params["lm_head"] = to_jnp(arr, transpose=True)
        elif name.startswith("model.layers."):
            parts = name.split(".")
            i = int(parts[2])
            if parts[3] == "self_attn":
                layer_stacks[parts[4]][i] = to_jnp(arr, transpose=True)
            elif parts[3] == "mlp":
                layer_stacks[parts[4]][i] = to_jnp(arr, transpose=True)
            elif parts[3] in ("input_layernorm", "post_attention_layernorm"):
                layer_stacks[parts[3]][i] = to_jnp(arr)

    for k, v in layer_stacks.items():
        missing = [i for i, x in enumerate(v) if x is None]
        assert not missing, f"missing {k} for layers {missing}"
        layer_stacks[k] = jnp.stack(v)

    if cfg.tie_word_embeddings and "lm_head" not in params:
        pass  # forward() falls back to embed_tokens.T
    assert "embed_tokens" in params and "norm" in params
    return cfg, params
