"""Round-4 consolidated TPU probe: staged so each phase prints before the
next begins (the tunnel compiles slowly; a silent run is indistinguishable
from a wedge — see the axon-tunnel notes in docs/RESULTS.md).

Phases:
  0. sanity: tiny device->host transfer (detects a wedged relay in seconds)
  1. fused-write attention micro: parity + us/call vs layer-view + commit
  2. full 7B (32L) decode step, int8 KV: ms/step -> tok/s
Run:  python tools/probe_r4b.py [--phase 012] [--depth 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def phase0():
    t0 = time.time()
    v = float(jnp.sum(jnp.ones((8, 128))))
    print(f"phase0 sanity: sum={v} in {time.time()-t0:.1f}s", flush=True)


def phase1():
    # L=4 keeps the probe's 5 cache replicas (inputs + aliased-output
    # copies at this standalone jit boundary + the .at[].set reference)
    # under HBM; the production step has NO such copies (zero cache-sized
    # copies in the compiled HLO — see docs/RESULTS.md r4) so full-step
    # timing (phase2) is the ground truth, not this micro.
    from mxq_tpu.ops import attn_int8
    L, b, h, s, d = 4, 8, 32, 2048, 128
    ks_ = jax.random.split(jax.random.PRNGKey(0), 7)
    kc = jax.random.randint(ks_[1], (L, b, h, s, d), -127, 128, jnp.int8)
    vc = jax.random.randint(ks_[2], (L, b, h, s, d), -127, 128, jnp.int8)
    ks = (jax.random.uniform(ks_[3], (L, b, h, s)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    vs = (jax.random.uniform(ks_[4], (L, b, h, s)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    q = jax.random.normal(ks_[0], (b, h, d), jnp.float32)
    kcur = jax.random.randint(ks_[5], (b, h, 1, d), -127, 128, jnp.int8)
    vcur = jax.random.randint(ks_[6], (b, h, 1, d), -127, 128, jnp.int8)
    kscur = jnp.full((b, h, 1), 0.015, jnp.bfloat16)
    vscur = jnp.full((b, h, 1), 0.012, jnp.bfloat16)
    positions = jnp.arange(b, dtype=jnp.int32) * 7 + 3
    print("phase1: arrays ready", flush=True)

    fn = jax.jit(attn_int8.int8_decode_attention_fused_write,
                 static_argnames=("interpret",))
    t0 = time.time()
    out, kc2, vc2 = fn(q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                       jnp.int32(1), positions, interpret=False)
    jax.block_until_ready((out, kc2, vc2))
    print(f"phase1: fused compile+run {time.time()-t0:.1f}s", flush=True)

    ref = attn_int8.int8_decode_attention_cur(
        q, kc[1], ks[1], vc[1], vs[1], kcur, kscur, vcur, vscur, positions)
    jax.block_until_ready(ref)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"phase1: ctx max-rel vs layer-view = {rel:.2e}", flush=True)
    # on-device write check, no big transfers: count mismatches vs .at[].set
    kc_ref = kc.at[1, jnp.arange(b), :, positions].set(kcur[:, :, 0])
    nbad = int(jnp.sum((kc2 != kc_ref).astype(jnp.int32)))
    print(f"phase1: code-write mismatches = {nbad}", flush=True)

    # No standalone timing loop here: at this jit boundary XLA inserts
    # defensive copies of the full stacks for the aliased outputs (the
    # production step, with donated caches, has ZERO such copies — checked
    # in the compiled HLO), so standalone us/call would only measure copy
    # overhead the real path doesn't pay. phase2's full-step time is the
    # ground truth.


def phase2(depth):
    from mxq_tpu.models import llama
    from bench import packed_params, bench_decode, BATCH
    key = jax.random.PRNGKey(0)
    cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=depth)
    print("phase2: building packed params...", flush=True)
    params = packed_params(cfg, key)
    print("phase2: params ready; compiling decode step...", flush=True)
    t = bench_decode(cfg, params, kv_quant=True)
    print(f"phase2: int8-KV step {t*1e3:.3f} ms -> {BATCH/t:.1f} tok/s "
          f"(depth {depth})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="012")
    ap.add_argument("--depth", type=int, default=32)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if "0" in args.phase:
        phase0()
    if "1" in args.phase:
        phase1()
    if "2" in args.phase:
        phase2(args.depth)


if __name__ == "__main__":
    main()
