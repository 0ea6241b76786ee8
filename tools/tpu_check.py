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
from mxq_tpu.ops import uniform4 as u4
from mxq_tpu.utils.benchlib import time_op
from mxq_tpu.utils.profiling import Roofline

CFG = MXQConfig()
V5E_HBM_GBPS = 819.0


def packed_bytes(p):
    return (p.w2.size * 4 + p.w4.size * 4 + p.meta2.size * 4
            + p.qscale.size * 2 + p.qmin.size * 2 + p.smeta4.size * 4)


def check_paged_int8():
    """On-device parity of the paged int8 attention kernel (Mosaic tiling
    of the scalar-prefetched page blocks + [.., 1, PAGE] scale blocks is
    NOT exercised by interpret mode)."""
    from mxq_tpu.ops import attn_int8 as A
    B, HQ, HKV, D = 8, 32, 32, 128
    P, PAGE, PPS = 13, A.PAGE_INT8, 4
    ks_ = jax.random.split(jax.random.PRNGKey(7), 6)
    q = jax.random.normal(ks_[0], (B, HQ, D), jnp.float32)
    kp = jax.random.randint(ks_[1], (HKV, P, PAGE, D), -127, 128, jnp.int8)
    vp = jax.random.randint(ks_[2], (HKV, P, PAGE, D), -127, 128, jnp.int8)
    ksc = (jax.random.uniform(ks_[3], (HKV, P, 1, PAGE)) * 0.02
           + 1e-3).astype(jnp.bfloat16)
    vsc = (jax.random.uniform(ks_[4], (HKV, P, 1, PAGE)) * 0.02
           + 1e-3).astype(jnp.bfloat16)
    tables = jax.random.randint(ks_[5], (B, PPS), 1, P, jnp.int32)
    lengths = (jnp.arange(B, dtype=jnp.int32) * 53 + 1) % (PPS * PAGE) + 1
    out = A.int8_paged_decode_attention(q, kp, ksc, vp, vsc, lengths,
                                        tables, interpret=False)
    # reference: gather + dense int8 attention oracle
    def gather(pages, scales):
        kk = pages[:, tables].astype(jnp.float32) * \
            scales[:, tables].transpose(0, 1, 2, 4, 3).astype(jnp.float32)
        return kk.transpose(1, 0, 2, 3, 4).reshape(B, HKV, PPS * PAGE, D)
    kd, vd = gather(kp, ksc), gather(vp, vsc)
    st = jnp.einsum("bhd,bhsd->bhs", q, kd) / np.sqrt(D)
    mask = jnp.arange(PPS * PAGE)[None, None, :] < lengths[:, None, None]
    st = jnp.where(mask, st, -1e30)
    pr = jax.nn.softmax(st, -1)
    ref = jnp.einsum("bhs,bhsd->bhd", pr, vd)
    rel = float(jnp.max(jnp.abs(out - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    status = "OK " if rel < 2e-2 else "BAD"
    print(f"[{status}] paged-int8 attention: max-rel={rel:.3g} "
          f"(B={B} HKV={HKV} pages={PPS}x{PAGE})")


def main():
    print("devices:", jax.devices())
    check_paged_int8()
    for (o, k) in [(4096, 4096), (11008, 4096), (4096, 11008)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (o, k), jnp.float32)
        p = packfmt.quantize_pack(w, CFG)
        p = jax.device_put(p)
        wdq_ref = packfmt.unpack_dequant(p, CFG).astype(jnp.bfloat16)

        for b in [1, 8, 128]:
            x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.float32)
            y_ref = x.astype(jnp.bfloat16) @ wdq_ref
            # every unpack layout must hold parity ON DEVICE at every shape:
            # a Mosaic lowering regression is caught here by the driver
            # bench, not discovered in the headline autotune (VERDICT r2 #5).
            # Tolerance 2e-2 = the independent-bf16-MXU-rounding envelope
            # (measured ~4.7e-3; see bench.autotune_layout), except bfexp
            # whose in-kernel bf16 multiply-sub carries ~2x that.
            layouts = ("slab", "quad", "bfexp") + (("bdg",) if b == 1
                                                  else ())
            for layout in layouts:
                y = mm.mxq_matmul(x, p, CFG, interpret=False, layout=layout)
                if layout == "bdg":
                    # bdg is EXACT vs the f32 dequant (codes + bf16 x are
                    # exactly representable -> error-free bf16 MXU pass);
                    # the bf16-rounded y_ref the slab bodies are gated on
                    # would charge bdg the REFERENCE's own rounding
                    ref32 = (x.astype(jnp.bfloat16).astype(jnp.float32)
                             @ packfmt.unpack_dequant(p, CFG))
                    err = float(jnp.max(jnp.abs(y - ref32)))
                    rel = err / max(1e-9, float(jnp.max(jnp.abs(ref32))))
                    tol = 1e-4
                else:
                    err = float(jnp.max(jnp.abs(
                        y - y_ref.astype(jnp.float32))))
                    rel = err / max(1e-9, float(jnp.max(jnp.abs(y_ref))))
                    tol = 2e-2 if layout != "bfexp" else 5e-2
                status = "OK " if rel < tol else "BAD"
                print(f"[{status}] O={o} K={k} B={b} {layout:5s}: "
                      f"max_abs_err={err:.4f} rel={rel:.4g}")

        wbf = jax.device_put(wdq_ref)
        pb = packed_bytes(p)
        # AWQ-style uniform-4b baseline (the reference's third comparison
        # column, test_mxq_gemv.py:57-80) + the uniform-2b kernel
        # (gemv_cuda.cu:259-345, never exposed by the reference's dispatch)
        pu = u4.quantize_pack_u4(w)
        pub = pu.w.size * 4 + pu.s.size * 2 + pu.z.size * 2
        pu2 = u4.quantize_pack_u2(w)
        pu2b = pu2.w.size * 4 + pu2.s.size * 2 + pu2.z.size * 2

        def back_to_x(y, k):
            # Map [b, o] output back to an x-shaped carry, CONSUMING every
            # output column — slicing alone lets XLA dead-code-eliminate the
            # unused part of the baseline matmul (observed: "2 TB/s" bf16).
            o_ = y.shape[1]
            pad_to = -(-o_ // k) * k
            folded = jnp.pad(y, ((0, 0), (0, pad_to - o_))).reshape(
                y.shape[0], pad_to // k, k).sum(axis=1)
            return (folded * 1e-6).astype(jnp.bfloat16)

        for b in [1, 8, 128, 512]:
            x0 = jnp.ones((b, k), jnp.bfloat16)
            t_bf = time_op(lambda w, x: back_to_x(x @ w, k), x0, const=wbf)
            t_q = time_op(lambda c, x: back_to_x(
                mm.mxq_matmul(x, c, CFG, interpret=False), k), x0, const=p)
            t_u4 = time_op(lambda c, x: back_to_x(
                u4.u4_matmul(x, c), k), x0, const=pu)
            t_u2 = time_op(lambda c, x: back_to_x(
                u4.u2_matmul(x, c), k), x0, const=pu2)
            rl = Roofline("mxq_gemm", bytes_accessed=pb + 2 * b * (k + o),
                          flops=2 * b * o * k).report(t_q)
            print(f"  B={b:4d}: bf16 {t_bf*1e6:7.1f}us "
                  f"({o*k*2/t_bf/1e9:6.1f} GB/s) | "
                  f"u4 {t_u4*1e6:7.1f}us ({pub/t_u4/1e9:6.1f} GB/s wt) | "
                  f"u2 {t_u2*1e6:7.1f}us ({pu2b/t_u2/1e9:6.1f} GB/s wt) | "
                  f"mxq {t_q*1e6:7.1f}us ({pb/t_q/1e9:6.1f} GB/s wt, "
                  f"{rl['pct_of_roofline']:5.1f}% roofline, {rl['bound']}-bound)"
                  f" | speedup {t_bf/t_q:5.2f}x | bits/w {8*pb/(o*k):4.2f}")


if __name__ == "__main__":
    main()
