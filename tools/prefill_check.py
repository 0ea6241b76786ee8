"""On-device prefill validation + throughput.

1. Parity: cached prefill (flash path, cache_pos=0) logits vs no-cache
   forward on a small model — pins the flash-over-fresh-keys rewrite.
2. Perf: [1, 2048] prefill through llama.forward with caches on a 7B-shape
   (depth 8, x4-extrapolated like docs/RESULTS.md) — packed vs bf16 dense.

Usage: python tools/prefill_check.py [--bench]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.utils.benchlib import time_op


def parity():
    cfg = llama.LlamaConfig.tiny(
        hidden_size=512, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512)  # head_dim 128 for flash
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0,
                             cfg.vocab_size)
    ref, _ = jax.jit(lambda p, i: llama.forward(p, i, cfg))(params, ids)

    for kv_quant in (False, True):
        if kv_quant:
            from mxq_tpu.serving import kvcache
            caches = kvcache.init_quant_cache(
                cfg.num_hidden_layers, 2, 320, cfg.num_key_value_heads,
                cfg.head_dim)
        else:
            caches = llama.init_cache(cfg, 2, 320)
        out, _ = jax.jit(lambda p, i, c: llama.forward(
            p, i, cfg, caches=c, cache_pos=0))(params, ids, caches)
        err = float(jnp.max(jnp.abs(out - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"cached-prefill parity (kv_quant={kv_quant}): "
              f"max_abs={err:.4f} rel={rel:.4f}", flush=True)
        assert rel < (0.12 if kv_quant else 0.02), rel


def bench():
    from bench import packed_params
    t_tokens = 2048
    ids = jnp.zeros((1, t_tokens), jnp.int32)

    nl = 8
    cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=nl)

    import dataclasses as _dc
    cfg_a8 = _dc.replace(cfg, prefill_act_bits=8)
    pk = packed_params(cfg, jax.random.PRNGKey(0))
    for label, params, c in (
        ("bf16", llama.init_params(cfg, jax.random.PRNGKey(0),
                                   jnp.bfloat16), cfg),
        ("mxq-packed", pk, cfg),
        ("mxq-packed-a8", pk, cfg_a8),
    ):
        def prefill_c(params, carry, _c=c):
            caches = carry["caches"]
            logits, caches = llama.forward(params, carry["ids"], _c,
                                           caches=caches, cache_pos=0)
            ids2 = jnp.roll(carry["ids"], 1, axis=1)
            return dict(ids=ids2, caches=caches)

        carry = dict(ids=ids, caches=llama.init_cache(cfg, 1, t_tokens))
        t = time_op(prefill_c, carry, reps=2, const=params)
        tok_s = t_tokens / t * nl / 32  # normalized to 32 layers
        print(f"{label}: {t*1e3:.1f} ms for [1,{t_tokens}] at depth {nl} "
              f"-> {tok_s:.0f} tok/s (32L-extrapolated)", flush=True)
        del carry
        jax.clear_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    parity()
    if args.bench:
        bench()


if __name__ == "__main__":
    main()
