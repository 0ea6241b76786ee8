"""QAT training data — rebuild of LLM-QAT/utils/datautils.py and the data
synthesis flow (LLM-QAT/generate_data.py + merge_gen_data.py).

* ``chunked_dataset``: tokenize-all -> concatenate -> split into block_size
  chunks with labels = input_ids (datautils.py:57-114, CustomJsonDataset).
* ``read_jsonl_texts`` + first-N-as-validation split (datautils.py:52-53).
* ``synthesize_corpus``: the reference's from-scratch data generation — for
  each seed token: generate 3-5 tokens greedily, then sample to full length
  (generate_data.py:24-51, logic the reference keeps commented but documents
  in its README) — implemented against our model with jitted sampling.
* ``merge_chunks``: concatenate per-worker jsonl shards (merge_gen_data.py).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama


def read_jsonl_texts(path: str, field: str = "text") -> list[str]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line)[field])
    return out


def train_valid_split(items: list, valid_size: int = 10000):
    """First N entries become validation (datautils.py:52-53)."""
    return items[valid_size:], items[:valid_size]


def chunked_dataset(token_streams: Sequence[np.ndarray],
                    block_size: int = 2048) -> np.ndarray:
    """Concatenate token streams and chunk to [N, block_size]
    (datautils.py:77-114: drop the trailing remainder)."""
    all_tokens = np.concatenate([np.asarray(t, np.int32)
                                 for t in token_streams])
    n = len(all_tokens) // block_size
    return all_tokens[: n * block_size].reshape(n, block_size)


def batches(data: np.ndarray, batch_size: int, seed: int = 0,
            epochs: int = 1) -> Iterator[dict]:
    rng = np.random.RandomState(seed)
    for _ in range(epochs):
        order = rng.permutation(len(data))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            ids = data[order[i:i + batch_size]]
            yield {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}


# ---------------------------------------------------------------------------
# Data synthesis from the fp model (generate_data.py semantics)
# ---------------------------------------------------------------------------


def synthesize_corpus(params, cfg: llama.LlamaConfig, seed_tokens: np.ndarray,
                      length: int = 2048, greedy_prefix_min: int = 3,
                      greedy_prefix_max: int = 5, temperature: float = 1.0,
                      key: Optional[jax.Array] = None) -> np.ndarray:
    """For each seed token: 3-5 greedy tokens, then sample to ``length``
    (generate_data.py:40-47). Returns [num_seeds, length] int32. Batched and
    jitted: one lax.scan generates all sequences in lockstep."""
    key = key if key is not None else jax.random.PRNGKey(0)
    b = len(seed_tokens)
    greedy_len = np.asarray(
        jax.random.randint(key, (b,), greedy_prefix_min,
                           greedy_prefix_max + 1))

    caches = llama.init_cache(cfg, b, length, dtype=jnp.float32)
    tokens0 = jnp.asarray(seed_tokens, jnp.int32)[:, None]

    @partial(jax.jit, donate_argnums=(1,))
    def gen_step(params, caches, tok, pos, k):
        logits, caches = llama.forward(params, tok, cfg, caches=caches,
                                       cache_pos=pos)
        lg = logits[:, -1]
        greedy = jnp.argmax(lg, axis=-1)
        sampled = jax.random.categorical(k, lg / temperature, axis=-1)
        use_greedy = (pos + 1) < jnp.asarray(greedy_len)
        nxt = jnp.where(use_greedy, greedy, sampled).astype(jnp.int32)
        return caches, nxt[:, None]

    toks = [np.asarray(tokens0[:, 0])]
    tok = tokens0
    for pos in range(length - 1):
        key, k = jax.random.split(key)
        caches, tok = gen_step(params, caches, tok, pos, k)
        toks.append(np.asarray(tok[:, 0]))
    return np.stack(toks, axis=1).astype(np.int32)


def write_jsonl_chunk(path: str, sequences: np.ndarray,
                      detokenize=None) -> None:
    """Write one worker's generated shard (gen.chunk.NN.jsonl format)."""
    with open(path, "w") as f:
        for seq in sequences:
            text = (detokenize(seq) if detokenize is not None
                    else " ".join(map(str, seq.tolist())))
            f.write(json.dumps({"text": text}) + "\n")


def merge_chunks(chunk_dir: str, out_path: str,
                 pattern: str = "gen.chunk") -> int:
    """Concatenate worker shards into one corpus (merge_gen_data.py:12-24)."""
    n = 0
    with open(out_path, "w") as out:
        for name in sorted(os.listdir(chunk_dir)):
            if pattern in name and name.endswith(".jsonl"):
                with open(os.path.join(chunk_dir, name)) as f:
                    for line in f:
                        if line.strip():
                            out.write(line)
                            n += 1
    return n
