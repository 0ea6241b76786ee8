"""Round-3 serving-config measurements on device:
 1. 7B decode step with the int8 KV cache (vs bf16 cache) at B=8.
 2. Prefill regime at [2048, K] 7B shapes: dense bf16 XLA matmul vs packed
    dequant-prefill vs the A8 int8-MXU prefill (VERDICT r2 #4 — the A8
    path's on-device throughput was never measured)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from mxq_tpu.ops import mxq_matmul as mm
from mxq_tpu.utils.benchlib import time_op, fold_to_input
from bench import packed_params, bench_decode, random_packed_linear, BATCH

key = jax.random.PRNGKey(0)

# ---- prefill per-linear (cheap; run first) ----
T = 2048
for (k, o) in ((4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)):
    p = random_packed_linear(key, k, o)
    wbf = mm.mxq_dequant_weight(p).astype(jnp.bfloat16)[:, :o]
    x = jnp.ones((T, k), jnp.bfloat16)

    t_bf = time_op(lambda w, x: fold_to_input(x @ w, k), x, const=wbf)
    del wbf
    t_pk = time_op(lambda c, x: fold_to_input(
        mm.mxq_matmul_prefill(x, c), k), x, const=p)
    try:
        t_a8 = time_op(lambda c, x: fold_to_input(
            mm.mxq_matmul_prefill_a8(x, c), k), x, const=p)
    except Exception as e:  # noqa: BLE001
        t_a8 = float("inf")
        print("a8 error:", type(e).__name__, str(e)[:100])
    tf = 2 * T * k * o
    print(f"[{k}x{o}] T={T}: bf16 {t_bf*1e6:7.1f}us ({tf/t_bf/1e12:5.1f} Top/s)"
          f" | packed {t_pk*1e6:7.1f}us ({tf/t_pk/1e12:5.1f})"
          f" | a8 {t_a8*1e6:7.1f}us ({tf/t_a8/1e12:5.1f})", flush=True)
    del p
    jax.clear_caches()

# ---- decode step, bf16 KV vs int8 KV ----
cfg = llama.LlamaConfig.llama2_7b()
params = packed_params(cfg, key)
t = bench_decode(cfg, params)
print(f"decode step bf16-KV: {t*1e3:.3f} ms  ({BATCH/t:.1f} tok/s)", flush=True)
t8 = bench_decode(cfg, params, kv_quant=True)
print(f"decode step int8-KV: {t8*1e3:.3f} ms  ({BATCH/t8:.1f} tok/s)",
      flush=True)
