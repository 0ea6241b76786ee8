"""Packed-format quality quantification (VERDICT r1 weak #8).

The packed storage format deviates from the reference PTQ semantics in three
ways (packfmt.py docstring): integer zero codes, 8-bit first-order scale
codes (the reference PTQ uses 4, mxqgpt.py:425), and K-direction second-order
qq groups. This tool measures what those deviations cost in END-TO-END
perplexity on a tiny-but-trained model:

  1. trains a tiny Llama on a sparse-Markov synthetic corpus (CPU, ~3 min;
     a Zipf unigram stream has no sequential structure — quantization error
     was invisible on it, all variants within 0.05% of fp)
  2. evaluates held-out ppl with weights
       fp          — trained bf16/f32 weights
       ref-ptq     — reference-semantics fake quant (scheme.mxq_fake_quant_ptq:
                     fp zeros, 16-row qq groups — the golden-matched math)
       packed-8b   — quantize_pack -> unpack_dequant (the serving format)
       packed-4b   — same with 4-bit scale codes (the reference's width)

Storage note: 4b vs 8b scale codes are FREE at the byte level — the three
codes live in one int32 meta word per 64-column block either way (the
reference instead pads those bits, gemv_mxq_cuda.cu:102-133), so the only
question is whether the finer codes buy quality. Results go in
docs/RESULTS.md.

Run: python tools/quality_packed.py [--steps N]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from mxq_tpu import packfmt, scheme
from mxq_tpu.eval.ppl import eval_ppl
from mxq_tpu.models import llama


SEQ = 128


def markov_corpus(vocab_size: int, n_tokens: int, branch: int = 4,
                  seed: int = 0) -> np.ndarray:
    """Sparse first-order Markov chain: each token has ``branch`` successors
    with skewed probabilities. Unlike a Zipf unigram stream, this has
    learnable sequential structure, so the trained weights matter and
    quantization error shows up in ppl."""
    rng = np.random.RandomState(seed)
    succ = rng.randint(0, vocab_size, size=(vocab_size, branch))
    p = np.array([0.6, 0.25, 0.1, 0.05][:branch])
    p = p / p.sum()
    out = np.empty(n_tokens, np.int32)
    t = rng.randint(vocab_size)
    for i in range(n_tokens):
        out[i] = t
        t = succ[t, rng.choice(branch, p=p)]
    return out


def train_tiny(cfg, tokens, steps, batch=8, lr=1e-3, seed=0):
    params = llama.init_params(cfg, jax.random.PRNGKey(seed),
                               dtype=jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            logits, _ = llama.forward(p, ids, cfg)
            return llama.cross_entropy_loss(logits, ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    n = len(tokens) - SEQ
    loss = None
    for i in range(steps):
        idx = rng.randint(0, n, size=batch)
        ids = jnp.asarray(np.stack([tokens[j:j + SEQ] for j in idx]))
        params, opt_state, loss = step(params, opt_state, ids)
        if i % 100 == 0:
            print(f"  train step {i}: loss {float(loss):.4f}", flush=True)
    print(f"  final loss {float(loss):.4f}", flush=True)
    return params


def map_linears(params, fn):
    out = dict(params)
    layers = dict(params["layers"])
    for name in llama.LAYER_LINEARS:
        layers[name] = jax.vmap(fn)(layers[name])
    out["layers"] = layers
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--gqa", action="store_true",
                    help="GQA config (8 query heads sharing 2 KV heads) — "
                         "the 70B shape class (VERDICT r2 #10)")
    args = ap.parse_args()

    cfg = (llama.LlamaConfig.tiny(num_attention_heads=8,
                                  num_key_value_heads=2)
           if args.gqa else llama.LlamaConfig.tiny())
    corpus = markov_corpus(cfg.vocab_size, 200_000, seed=0)
    train_toks, test_toks = corpus[:180_000], corpus[180_000:]

    print("training tiny model...", flush=True)
    params = train_tiny(cfg, train_toks, args.steps)

    mcfg = cfg.scheme

    def ref_ptq(w):                       # w [K, O] -> reference-PTQ roundtrip
        return scheme.mxq_fake_quant_ptq(w.T, mcfg).T.astype(w.dtype)

    def packed_roundtrip(w):
        p = packfmt.quantize_pack(w.T, mcfg)
        return packfmt.unpack_dequant(p, mcfg).astype(w.dtype)

    variants = {"fp": params,
                "ref-ptq": map_linears(params, ref_ptq),
                "packed-8b": map_linears(params, packed_roundtrip)}

    # 4-bit scale codes: temporarily narrow the meta field
    saved = (packfmt.SCALE_CODE_BITS, packfmt.SCALE_CODE_MAX)
    try:
        packfmt.SCALE_CODE_BITS, packfmt.SCALE_CODE_MAX = 4, 15
        variants["packed-4b"] = map_linears(params, packed_roundtrip)
    finally:
        packfmt.SCALE_CODE_BITS, packfmt.SCALE_CODE_MAX = saved

    # opt-in packed uniform-4b lm_head (EngineConfig.lm_head_bits=4):
    # decoder linears at reference PTQ semantics + u4 head, so the row
    # isolates what quantizing the head costs on top of the W2.8 weights
    from mxq_tpu.ops import uniform4
    head = jnp.asarray(params["lm_head"])
    variants["u4-head"] = dict(
        variants["ref-ptq"],
        lm_head=uniform4.fake_quant_u4(head.T).T.astype(head.dtype))

    print(f"\n{'variant':<12} {'ppl':>10} {'vs fp':>8}")
    base = None
    for name, p in variants.items():
        ppl = eval_ppl(p, cfg, test_toks, seqlen=SEQ, batch=4)
        if base is None:
            base = ppl
        print(f"{name:<12} {ppl:>10.4f} {ppl / base:>8.4f}", flush=True)

    # A8 execution path: same packed weights, int8-MXU prefill matmuls
    # (per-token act quant + per-channel weight requant, mxq_matmul A8
    # section) — measures what serving with prefill_a8 costs in ppl.
    import dataclasses
    packed = llama.quantize_params_packed(params, cfg, fuse=False)
    cfg8 = dataclasses.replace(cfg, prefill_act_bits=8)
    for name, c in (("packed-exec", cfg), ("packed-a8", cfg8)):
        ppl = eval_ppl(packed, c, test_toks, seqlen=SEQ, batch=4)
        print(f"{name:<12} {ppl:>10.4f} {ppl / base:>8.4f}", flush=True)

    # GEMV-path (decode) quality per unpack layout: batch=1 keeps every
    # matmul under the 512-token prefill threshold, so the fused GEMV kernel
    # runs with the selected layout (slab/quad are exact; bfexp trades bf16
    # multiply-sub precision for fewer VPU ops).
    from mxq_tpu.ops import mxq_matmul as mmod
    saved_layout = mmod.GEMV_LAYOUT
    try:
        for layout in ("slab", "quad", "bfexp"):
            mmod.GEMV_LAYOUT = layout
            ppl = eval_ppl(packed, cfg, test_toks[:8192], seqlen=SEQ,
                           batch=1)
            print(f"gemv-{layout:<7} {ppl:>10.4f} {ppl / base:>8.4f}",
                  flush=True)
    finally:
        mmod.GEMV_LAYOUT = saved_layout


if __name__ == "__main__":
    main()
