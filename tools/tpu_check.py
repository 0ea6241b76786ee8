"""On-TPU correctness + microbenchmark of the MXQ dequant-matmul kernel.

The TPU analogue of the reference's cuda_kernel/test_mxq_gemv.py timing loop
(fp16 vs awq-4b vs mxq-2.8b on 4096x4096): here bf16-XLA-matmul vs the Pallas
packed kernel, plus bandwidth roofline accounting.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu import packfmt
from mxq_tpu.config import MXQConfig
from mxq_tpu.ops import mxq_matmul as mm

CFG = MXQConfig()
V5E_HBM_GBPS = 819.0


def bench(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def packed_bytes(p):
    return (p.w2.size * 4 + p.w4.size * 4 + p.meta2.size * 4
            + p.qscale.size * 2 + p.qmin.size * 2 + p.smeta4.size * 4)


def main():
    print("devices:", jax.devices())
    for (o, k) in [(4096, 4096), (11008, 4096), (4096, 11008)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
        p = packfmt.quantize_pack(w, CFG)
        p = jax.device_put(p)
        wdq_ref = packfmt.unpack_dequant(p, CFG).astype(jnp.bfloat16)

        for b in [1, 8, 128]:
            x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)
            y = mm.mxq_matmul(x, p, CFG, interpret=False)
            y_ref = x.astype(jnp.bfloat16) @ wdq_ref
            err = float(jnp.max(jnp.abs(y - y_ref.astype(jnp.float32))))
            rel = err / max(1e-9, float(jnp.max(jnp.abs(y_ref))))
            status = "OK " if rel < 2e-2 else "BAD"
            print(f"[{status}] O={o} K={k} B={b}: max_abs_err={err:.4f} rel={rel:.4g}")

        wbf = jax.device_put(wdq_ref)
        xb1 = jax.device_put(jnp.ones((1, k), jnp.bfloat16))
        f_bf = jax.jit(lambda x, w: x @ w)
        t_bf = bench(f_bf, xb1, wbf)
        f_q = jax.jit(lambda x: mm.mxq_matmul(x, p, CFG, interpret=False))
        t_q = bench(f_q, xb1)
        pb = packed_bytes(p)
        bw_q = pb / t_q / 1e9
        bw_bf = (o * k * 2) / t_bf / 1e9
        print(f"  GEMV B=1: bf16 {t_bf*1e6:8.1f}us ({bw_bf:6.1f} GB/s) | "
              f"mxq {t_q*1e6:8.1f}us ({bw_q:6.1f} GB/s wt-bytes, "
              f"{100*bw_q/V5E_HBM_GBPS:4.1f}% of HBM peak) | "
              f"speedup {t_bf/t_q:4.2f}x | bits/w {8*pb/(o*k):4.2f}")

        for b in [128, 512]:
            xb = jax.device_put(jnp.ones((b, k), jnp.bfloat16))
            t_bfb = bench(f_bf, xb, wbf)
            t_qb = bench(f_q, xb)
            fl = 2 * b * o * k
            print(f"  GEMM B={b}: bf16 {t_bfb*1e6:8.1f}us ({fl/t_bfb/1e12:5.1f} TF) "
                  f"| mxq {t_qb*1e6:8.1f}us ({fl/t_qb/1e12:5.1f} TF) "
                  f"| ratio {t_qb/t_bfb:4.2f}x")


if __name__ == "__main__":
    main()
