"""Round-4 probe: current 7B decode step time (int8 KV, packed) + optional
device-trace attribution. Run on the real TPU.

  python tools/probe_r4_step.py [--trace /tmp/r4trace] [--depth 32]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from bench import packed_params, bench_decode, BATCH, CACHE_LEN, decode_step_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--depth", type=int, default=32)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=args.depth)
    params = packed_params(cfg, key)

    t = bench_decode(cfg, params, kv_quant=True)
    print(f"int8-KV step: {t*1e3:.3f} ms  -> {BATCH/t:.1f} tok/s "
          f"(depth {args.depth})", flush=True)

    if args.trace:
        from mxq_tpu.serving import kvcache
        caches = kvcache.init_quant_cache(
            cfg.num_hidden_layers, BATCH, CACHE_LEN,
            cfg.num_key_value_heads, cfg.head_dim)
        carry = dict(ids=jnp.zeros((BATCH, 1), jnp.int32),
                     caches=caches, pos=jnp.int32(0))
        step = jax.jit(decode_step_fn(cfg), donate_argnums=(1,))
        carry = step(params, carry)           # compile
        jax.block_until_ready(carry["ids"])
        jax.profiler.start_trace(args.trace)
        for _ in range(10):
            carry = step(params, carry)
        jax.block_until_ready(carry["ids"])
        jax.profiler.stop_trace()
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
