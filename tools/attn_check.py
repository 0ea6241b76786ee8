"""On-device check + microbench for the fused int8-KV decode attention kernel
(ops/attn_int8.py) and the head-major cache path.

Usage: python tools/attn_check.py [--bench]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.ops import attn_int8
from mxq_tpu.utils.benchlib import time_op


def check(b, hq, hkv, s, d):
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
    kc = jax.random.randint(keys[1], (b, hkv, s, d), -127, 128, jnp.int8)
    vc = jax.random.randint(keys[2], (b, hkv, s, d), -127, 128, jnp.int8)
    ks = (jax.random.uniform(keys[3], (b, hkv, s)) * 0.02 + 0.001
          ).astype(jnp.bfloat16)
    vs = (jax.random.uniform(keys[4], (b, hkv, s)) * 0.02 + 0.001
          ).astype(jnp.bfloat16)
    positions = jnp.full((b,), s - 1, jnp.int32).at[0].set(s // 2)
    out = attn_int8.int8_decode_attention(q, kc, ks, vc, vs, positions,
                                          interpret=False)
    ref = attn_int8.int8_decode_attention_reference(q, kc, ks, vc, vs,
                                                    positions)
    err = float(jnp.max(jnp.abs(out - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"b={b} hq={hq} hkv={hkv} s={s} d={d}: rel_err={err:.2e}",
          flush=True)
    assert err < 3e-2, err
    return q, kc, ks, vc, vs, positions


def bench(b, hq, hkv, s, d):
    q, kc, ks, vc, vs, positions = check(b, hq, hkv, s, d)

    def step(c, qin):
        kc_, ks_, vc_, vs_, pos_ = c
        return attn_int8.int8_decode_attention(qin, kc_, ks_, vc_, vs_, pos_,
                                               interpret=False)

    t = time_op(step, q, const=(kc, ks, vc, vs, positions))
    byt = 2 * b * hkv * s * d  # int8 k+v codes
    print(f"  fused int8 attn: {t*1e6:.1f} us  ({byt/t/1e9:.0f} GB/s codes)",
          flush=True)

    # baseline: dequant-to-bf16 then einsum (the round-1 path)
    def step_ref(c, qin):
        kc_, ks_, vc_, vs_, pos_ = c
        return attn_int8.int8_decode_attention_reference(qin, kc_, ks_, vc_,
                                                         vs_, pos_)

    t2 = time_op(step_ref, q, const=(kc, ks, vc, vs, positions))
    print(f"  dequant+einsum reference: {t2*1e6:.1f} us", flush=True)

    # bf16 cache attention baseline (what the engine does with kv_quant=False)
    kb = (kc.astype(jnp.float32) * ks.astype(jnp.float32)[..., None]
          ).astype(jnp.bfloat16)
    vb = (vc.astype(jnp.float32) * vs.astype(jnp.float32)[..., None]
          ).astype(jnp.bfloat16)

    def step_bf16(c, qin):
        kb_, vb_, pos_ = c
        g = hq // hkv
        qg = qin.reshape(b, hkv, g, d)
        st = jnp.einsum("bhgd,bhsd->bhgs", qg.astype(jnp.float32),
                        kb_.astype(jnp.float32)) / np.sqrt(d)
        kpos = jnp.arange(s)[None, None, None, :]
        st = jnp.where(kpos <= pos_[:, None, None, None], st,
                       jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(st, axis=-1)
        ctx = jnp.einsum("bhgs,bhsd->bhgd", p, vb_.astype(jnp.float32))
        return ctx.reshape(b, hq, d)

    t3 = time_op(step_bf16, q, const=(kb, vb, positions))
    print(f"  bf16-cache einsum baseline: {t3*1e6:.1f} us", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if args.bench:
        # 7B shape: 32 heads, d=128; GQA 70B shape: 64q/8kv
        bench(8, 32, 32, 256, 128)
        bench(8, 32, 32, 1024, 128)
        bench(8, 32, 32, 2048, 128)
        bench(8, 64, 8, 2048, 128)
    else:
        check(8, 32, 32, 256, 128)
        check(2, 8, 4, 64, 64)


if __name__ == "__main__":
    main()
