"""Calibration / evaluation data — rebuild of mxq_quant/lib/data.py.

The reference samples 128 random 2048-token windows of tokenized wikitext-2
train for calibration (data.py:19-38) and evaluates perplexity on the joined
test split. HF datasets are used when available (cached locally); in
network-less environments a deterministic synthetic corpus stands in so the
pipeline stays runnable end-to-end.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def synthetic_corpus(vocab_size: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic Zipf-distributed token stream (a stand-in corpus with
    realistic long-tail token statistics)."""
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab_size + 1)
    p = 1.0 / ranks
    p /= p.sum()
    return rng.choice(vocab_size, size=n_tokens, p=p).astype(np.int32)


def _load_wikitext2(tokenizer, split: str) -> Optional[np.ndarray]:
    try:
        from datasets import load_dataset
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        text = "\n\n".join(ds["text"])
        return np.asarray(tokenizer(text)["input_ids"], dtype=np.int32)
    except Exception:
        return None


def get_calibration_batch(nsamples: int, seqlen: int, *,
                          tokenizer=None, vocab_size: int = 32000,
                          seed: int = 0,
                          dataset: str = "wikitext2") -> np.ndarray:
    """[nsamples, seqlen] int32 calibration windows (data.py:27-38: random
    2048-token windows of the train corpus)."""
    tokens = None
    if tokenizer is not None and dataset == "wikitext2":
        tokens = _load_wikitext2(tokenizer, "train")
    if tokens is None:
        tokens = synthetic_corpus(vocab_size, max(nsamples * seqlen * 2,
                                                  seqlen * 4 + 1), seed)
    rng = np.random.RandomState(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    for i in range(nsamples):
        j = rng.randint(0, len(tokens) - seqlen - 1)
        out[i] = tokens[j:j + seqlen]
    return out


def get_eval_tokens(*, tokenizer=None, vocab_size: int = 32000,
                    n_tokens: int = 2048 * 16, seed: int = 1,
                    dataset: str = "wikitext2") -> np.ndarray:
    """1-D token stream for stride-seqlen perplexity (data.py test split)."""
    tokens = None
    if tokenizer is not None and dataset == "wikitext2":
        tokens = _load_wikitext2(tokenizer, "test")
    if tokens is None:
        tokens = synthetic_corpus(vocab_size, n_tokens, seed)
    return tokens
