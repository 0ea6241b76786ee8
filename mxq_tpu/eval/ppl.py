"""Perplexity evaluation — rebuild of mxq_quant/lib/eval.py:10-76.

Reference protocol: join the whole test corpus, split into non-overlapping
seqlen-token windows (stride == seqlen), sum shifted-NLL over windows,
ppl = exp(total_nll / (nsamples * seqlen)). Same here, jitted per window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama


@partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, ids, cfg: llama.LlamaConfig):
    """Sum of shifted NLL over one [B, T] window batch (eval.py:45-68:
    logits[:-1] vs labels[1:], summed not averaged)."""
    logits, _ = llama.forward(params, ids, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


def eval_ppl(params, cfg: llama.LlamaConfig, tokens: np.ndarray,
             seqlen: int = 2048, batch: int = 1,
             max_windows: int | None = None) -> float:
    """Stride-seqlen perplexity over a 1-D token stream."""
    n = len(tokens) // seqlen
    if max_windows is not None:
        n = min(n, max_windows)
    assert n > 0, "not enough tokens for one window"
    total = 0.0
    count = 0
    for i in range(0, n, batch):
        b = min(batch, n - i)
        ids = jnp.asarray(
            np.stack([tokens[(i + j) * seqlen:(i + j + 1) * seqlen]
                      for j in range(b)]))
        total += float(_window_nll(params, ids, cfg))
        count += b * (seqlen - 1)
    return float(np.exp(total / count))
