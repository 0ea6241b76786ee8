"""Micro-probe: compile + parity + timing of int8_decode_attention_fused_write
alone on the real TPU (isolates the kernel from the full 32-layer model
compile). Compares against int8_decode_attention_cur on the layer view.

  python tools/probe_fused_write.py [--layers 4] [--seq 2048] [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.ops import attn_int8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    L, b, h, s, d = args.layers, args.batch, args.heads, args.seq, args.dim
    ks_ = jax.random.split(jax.random.PRNGKey(0), 7)
    q = jax.random.normal(ks_[0], (b, h, d), jnp.float32)
    kc = jax.random.randint(ks_[1], (L, b, h, s, d), -127, 128, jnp.int8)
    vc = jax.random.randint(ks_[2], (L, b, h, s, d), -127, 128, jnp.int8)
    ks = (jax.random.uniform(ks_[3], (L, b, h, s)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    vs = (jax.random.uniform(ks_[4], (L, b, h, s)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    kcur = jax.random.randint(ks_[5], (b, h, 1, d), -127, 128, jnp.int8)
    vcur = jax.random.randint(ks_[6], (b, h, 1, d), -127, 128, jnp.int8)
    kscur = jnp.full((b, h, 1), 0.015, jnp.bfloat16)
    vscur = jnp.full((b, h, 1), 0.012, jnp.bfloat16)
    positions = jnp.arange(b, dtype=jnp.int32) * 7 + 3

    fn = jax.jit(attn_int8.int8_decode_attention_fused_write,
                 static_argnames=("interpret",))
    t0 = time.time()
    out, kc2, vc2 = fn(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                       jnp.int32(1), positions, interpret=False)
    jax.block_until_ready(out)
    print(f"fused-write compile+run: {time.time()-t0:.1f}s", flush=True)

    ref = attn_int8.int8_decode_attention_cur(
        q, kc[1], ks[1], vc[1], vs[1], kcur, kscur, vcur, vscur, positions)
    ref = jax.block_until_ready(ref)
    rel = float(jnp.max(jnp.abs(out - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"ctx max-rel vs layer-view kernel: {rel:.2e}", flush=True)

    kc_ref = kc.at[1, jnp.arange(b), :, positions].set(kcur[:, :, 0])
    vc_ref = vc.at[1, jnp.arange(b), :, positions].set(vcur[:, :, 0])
    kdiff = int(jnp.sum(kc2 != kc_ref))
    vdiff = int(jnp.sum(vc2 != vc_ref))
    print(f"code-write mismatches: k={kdiff} v={vdiff}", flush=True)

    # timing: fused-write vs layer-view + dynamic_update_slice commit
    def run_fused(qq):
        o, k2, v2 = fn(qq, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                       jnp.int32(1), positions, interpret=False)
        return o

    view = jax.jit(lambda qq: attn_int8.int8_decode_attention_cur(
        qq, kc[1], ks[1], vc[1], vs[1], kcur, kscur, vcur, vscur, positions))
    for name, f in (("fused", run_fused), ("view", view)):
        f(q).block_until_ready()
        n = 50
        t0 = time.time()
        for _ in range(n):
            o = f(q)
        o.block_until_ready()
        dt = (time.time() - t0) / n
        print(f"{name}: {dt*1e6:.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
