"""Command-line drivers: one CLI, subcommands mirroring the reference's
entry points.

  ptq            <- mxq_quant/main.py --prune_method mxq (main.py:30-41,73-74)
  eval-ppl       <- wikitext ppl eval (main.py:83-86, lib/eval.py)
  eval-tasks     <- mxq_quant/lmeval.py (winogrande/piqa/hellaswag/arc_easy)
  train          <- LLM-QAT/run_train.sh + train.py (w_bits a_bits kv_bits)
  generate-data  <- LLM-QAT/generate_data.py (+merge via --merge)
  serve          <- no reference counterpart (continuous-batching engine demo)

Usage: python -m mxq_tpu.cli <subcommand> [args]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _load_model(args, w_bits=32, a_bits=32, kv_bits=32):
    import jax.numpy as jnp
    from mxq_tpu.models import hf_loader, llama

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[args.dtype]
    if args.model and os.path.isdir(args.model):
        cfg, params = hf_loader.load_params(args.model, dtype=dtype)
        cfg = dataclasses.replace(cfg, w_bits=w_bits, a_bits=a_bits,
                                  kv_bits=kv_bits)
    else:
        import jax
        preset = getattr(llama.LlamaConfig, args.preset)
        cfg = preset(w_bits=w_bits, a_bits=a_bits, kv_bits=kv_bits)
        if getattr(args, "layers", None):
            # shallow-depth drive of a full-width preset (e.g.
            # `ptq --preset llama2_70b --layers 1 --shard 1,2,4`): per-layer
            # memory behavior is depth-independent, so one layer validates
            # the 70B-class sharded calibration without 70B of host RAM
            cfg = dataclasses.replace(cfg, num_hidden_layers=args.layers)
        params = llama.init_params(cfg, jax.random.PRNGKey(args.seed), dtype)
    return cfg, params


def _tokenizer(args):
    if args.tokenizer:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(args.tokenizer)
    return None


def cmd_ptq(args):
    import jax.numpy as jnp
    from mxq_tpu.ptq import calibrate, data as ptq_data
    from mxq_tpu.eval import ppl as ppl_eval
    from mxq_tpu.models import llama

    cfg, params = _load_model(args)
    tok = _tokenizer(args)
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        args.nsamples, args.seqlen, tokenizer=tok,
        vocab_size=cfg.vocab_size, seed=args.seed, dataset=args.dataset))
    print(f"calibrating {cfg.num_hidden_layers} layers on "
          f"{args.nsamples}x{args.seqlen} {args.dataset} tokens "
          f"(mode={args.mode})")
    mesh = None
    if args.shard:
        parts = [int(v) for v in args.shard.split(",")]
        if len(parts) == 4:
            # DCN,DP,FSDP,TP: hybrid (multi-host) mesh — activations also
            # batch-shard over the dcn axis; the quantize math replicates
            # across hosts (it is layer-local)
            from mxq_tpu.parallel import multihost
            dcn, dp, fsdp, tp = parts
            mesh = multihost.make_hybrid_mesh(dcn=dcn, dp=dp, fsdp=fsdp,
                                              tp=tp)
            print(f"sharding calibration over hybrid mesh (dcn={dcn}, "
                  f"dp={dp}, fsdp={fsdp}, tp={tp})")
        else:
            from mxq_tpu.parallel import sharding as shlib
            dp, fsdp, tp = parts
            mesh = shlib.make_mesh(dp=dp, fsdp=fsdp, tp=tp)
            print(f"sharding calibration over mesh (dp={dp}, "
                  f"fsdp={fsdp}, tp={tp})")
    qparams, packed = calibrate.ptq_quantize(
        params, cfg, ids,
        calibrate.PTQConfig(mode=args.mode, chunk=args.chunk),
        progress=lambda i: print(f"  layer {i} done"), mesh=mesh)
    tokens = ptq_data.get_eval_tokens(tokenizer=tok,
                                      vocab_size=cfg.vocab_size,
                                      dataset=args.dataset,
                                      seqlen=args.seqlen)
    p = ppl_eval.eval_ppl(qparams, cfg, tokens, seqlen=args.seqlen,
                          max_windows=args.max_eval_windows)
    print(f"{args.dataset} ppl (quantized): {p:.4f}")
    if args.save_model:
        from mxq_tpu.utils import checkpoint as ckpt
        ckpt.save_params(args.save_model, qparams if packed is None
                         else packed, cfg)
        print(f"saved to {args.save_model}")


def cmd_prune(args):
    """Pruning driver — the reference PTQ CLI's prune dispatch
    (mxq_quant/main.py:64-86: --prune_method + sparsity_type + ppl)."""
    import jax.numpy as jnp
    from mxq_tpu.eval import ppl as ppl_eval
    from mxq_tpu.ptq import data as ptq_data, prune

    cfg, params = _load_model(args)
    tok = _tokenizer(args)
    n = m = 0
    if args.sparsity_type and ":" in args.sparsity_type:
        n, m = (int(v) for v in args.sparsity_type.split(":"))
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        args.nsamples, args.seqlen, tokenizer=tok,
        vocab_size=cfg.vocab_size, seed=args.seed, dataset=args.dataset))
    pruned = prune.prune_model(params, cfg, ids, method=args.prune_method,
                               sparsity=args.sparsity, n=n, m=m)
    print(f"actual sparsity {prune.check_sparsity(pruned):.4f}")
    tokens = ptq_data.get_eval_tokens(tokenizer=tok,
                                      vocab_size=cfg.vocab_size,
                                      dataset=args.dataset,
                                      seqlen=args.seqlen)
    p = ppl_eval.eval_ppl(pruned, cfg, tokens, seqlen=args.seqlen,
                          max_windows=args.max_eval_windows)
    print(f"{args.dataset} ppl (pruned): {p:.4f}")
    if args.save_model:
        from mxq_tpu.utils import checkpoint as ckpt
        ckpt.save_params(args.save_model, pruned, cfg)
        print(f"saved to {args.save_model}")


def cmd_eval_ppl(args):
    from mxq_tpu.ptq import data as ptq_data
    from mxq_tpu.eval import ppl as ppl_eval

    cfg, params = _load_model(args, w_bits=args.w_bits, a_bits=args.a_bits,
                              kv_bits=args.kv_bits)
    tok = _tokenizer(args)
    tokens = ptq_data.get_eval_tokens(tokenizer=tok,
                                      vocab_size=cfg.vocab_size,
                                      dataset=args.dataset,
                                      seqlen=args.seqlen)
    p = ppl_eval.eval_ppl(params, cfg, tokens, seqlen=args.seqlen,
                          max_windows=args.max_eval_windows)
    print(json.dumps({"dataset": args.dataset, "ppl": p}))


def cmd_eval_tasks(args):
    from mxq_tpu.eval import harness

    if args.tasks == "list":        # `--tasks list` prints the registry
        for name in sorted(harness.all_tasks()):
            print(name)
        return
    cfg, params = _load_model(args, w_bits=args.w_bits)
    tok = _tokenizer(args)
    if tok is None:
        print("eval-tasks requires --tokenizer", file=sys.stderr)
        sys.exit(2)
    # reference protocol: pieces are encoded WITHOUT special tokens and
    # the scorer prefixes bos to the context only (continuations never
    # carry one; empty contexts become [bos] — lm-eval base.py:195-201)
    lm = harness.MXQLM(params, cfg, batch_size=args.batch_size,
                       bos_id=tok.bos_token_id)
    tokenize = lambda s: np.asarray(
        tok(s, add_special_tokens=False)["input_ids"], np.int32)
    results = harness.evaluate(lm, tokenize, args.tasks.split(","),
                               limit=args.limit, tok=tok,
                               num_fewshot=args.num_fewshot)
    for r in results:
        print(json.dumps(r))
    if args.table:
        # evaluator.make_table analogue (lmeval.py:153): task | metric |
        # value rows, markdown-ish
        print(f"|{'task':<28}|{'metric':<18}|{'value':>10}|")
        print(f"|{'-'*28}|{'-'*18}|{'-'*10}|")
        for r in results:
            for k, v in r.items():
                if k in ("task", "n") or not isinstance(v, (int, float)):
                    continue
                print(f"|{r['task']:<28}|{k:<18}|{v:>10.4f}|")


def cmd_train(args):
    import jax
    from mxq_tpu.models import llama
    from mxq_tpu.qat import train, loop, data as qdata
    from mxq_tpu.parallel import sharding

    cfg, params = _load_model(args, w_bits=args.w_bits, a_bits=args.a_bits,
                              kv_bits=args.kv_bits)
    teacher = None
    teacher_cfg = dataclasses.replace(cfg, w_bits=32, a_bits=32, kv_bits=32)
    if args.use_kd:
        _, teacher = _load_model(args)

    if args.train_data and os.path.exists(args.train_data):
        texts = qdata.read_jsonl_texts(args.train_data)
        tok = _tokenizer(args)
        streams = [np.asarray(tok(t)["input_ids"]) for t in texts]
    else:
        from mxq_tpu.ptq import data as ptq_data
        streams = [ptq_data.synthetic_corpus(cfg.vocab_size,
                                             args.block_size * 64)]
    data = qdata.chunked_dataset(streams, args.block_size)
    # hold out the FIRST chunks as validation (train_valid_split encodes the
    # reference's first-N-as-valid protocol, datautils.py:52-53; eval ppl =
    # exp(eval_loss), train.py:137-148) — but never starve training: skip
    # the holdout entirely when the corpus is too small for both.
    val_batches = []
    if len(data) >= 3 * args.batch_size:
        n_val = min(4 * args.batch_size, len(data) // 3)
        data, val = qdata.train_valid_split(list(data), n_val)
        data = np.stack(data)
        val = np.stack(val)
        val_batches = [{"input_ids": val[i:i + args.batch_size]}
                       for i in range(0, len(val) - args.batch_size + 1,
                                      args.batch_size)][:4]
    it = qdata.batches(data, args.batch_size, epochs=args.epochs)

    mesh = None
    nd = len(jax.devices())
    if nd > 1:
        import math
        fsdp = math.gcd(nd, args.batch_size)
        if fsdp > 1:
            mesh = sharding.make_mesh(dp=1, fsdp=fsdp, tp=1)
    tc = train.TrainConfig(learning_rate=args.lr, use_kd=args.use_kd,
                           kd_loss_scale=args.kd_loss_scale,
                           total_steps=args.max_steps or len(data))
    lc = loop.LoopConfig(output_dir=args.output_dir,
                         save_steps=args.save_steps,
                         max_steps=args.max_steps)
    res = loop.run_training(params, teacher, cfg, tc, lc, it, mesh=mesh,
                            val_batches=val_batches)
    print(f"trained to step {res['last_step']}"
          + (f", eval_ppl={res['eval_ppl']:.4f}" if "eval_ppl" in res
             else ""))


def cmd_generate_data(args):
    import jax
    from mxq_tpu.qat import data as qdata

    cfg, params = _load_model(args)
    rng = np.random.RandomState(args.chunk_id)
    seeds = rng.randint(0, cfg.vocab_size, size=args.num_seeds).astype(np.int32)
    out = qdata.synthesize_corpus(params, cfg, seeds, length=args.length,
                                  key=jax.random.PRNGKey(args.chunk_id))
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"gen.chunk.{args.chunk_id:02d}.jsonl")
    qdata.write_jsonl_chunk(path, out)
    print(f"wrote {path}")
    if args.merge:
        n = qdata.merge_chunks(args.out_dir,
                               os.path.join(args.out_dir, "all_gen.jsonl"))
        print(f"merged {n} sequences")


def cmd_prune_vision(args):
    """Vision prune+eval flow — image_classifiers/main.py:317-341: build
    model, one calibration batch, prune, report accuracy before/after.
    Without ImageNet access the tiny presets run on the synthetic
    class-conditional dataset (vision/eval.py)."""
    import jax
    from mxq_tpu.vision import convnext, eval as veval, mixer, prune_vision
    from mxq_tpu.vision import swin, vit

    key = jax.random.PRNGKey(args.seed)
    if args.model in ("vit", "deit"):
        cfg = vit.ViTConfig.tiny(distilled=(args.model == "deit"))
        params = vit.init_params(cfg, key)
        fwd = vit.forward
        prune = lambda p, imgs: prune_vision.prune_vit(
            p, cfg, imgs, method=args.prune_metric, sparsity=args.sparsity,
            n=args.prune_n, m=args.prune_m)
        sparsity_of = prune_vision.check_sparsity
    elif args.model == "convnext":
        cfg = convnext.ConvNeXtConfig.tiny()
        params = convnext.init_params(cfg, key)
        fwd = convnext.forward
        prune = lambda p, imgs: prune_vision.prune_convnext(
            p, cfg, imgs, method=args.prune_metric, sparsity=args.sparsity,
            n=args.prune_n, m=args.prune_m)
        sparsity_of = prune_vision.check_sparsity_convnext
    elif args.model == "mixer":
        cfg = mixer.MixerConfig.tiny()
        params = mixer.init_params(cfg, key)
        fwd = mixer.forward
        prune = sparsity_of = None          # reference prunes convnext/vit only
    else:
        cfg = swin.SwinConfig.tiny()
        params = swin.init_params(cfg, key)
        fwd = swin.forward
        prune = sparsity_of = None

    img_size = getattr(cfg, "image_size", 32)
    batches = list(veval.synthetic_batches(cfg.num_classes, img_size,
                                           n=args.nsamples * 2))
    stats = veval.evaluate(fwd, params, cfg, batches)
    print(f"dense: acc1={stats['acc1']:.4f} acc5={stats['acc5']:.4f} "
          f"n={stats['n']}")
    if prune is None:
        print(f"{args.model}: eval-only (reference prunes convnext/vit/deit)")
        return
    calib = batches[0][0]
    pruned = prune(params, jax.numpy.asarray(calib))
    print(f"actual sparsity {sparsity_of(pruned):.4f}")
    stats = veval.evaluate(fwd, pruned, cfg, batches)
    print(f"pruned: acc1={stats['acc1']:.4f} acc5={stats['acc5']:.4f}")


def cmd_serve(args):
    from mxq_tpu.serving import engine as eng
    from mxq_tpu.models import llama

    if args.paged and args.spec_decode:
        raise SystemExit("--spec_decode applies to the slot engine "
                         "(drop --paged)")
    if args.paged and args.prefill_a8:
        print("note: --prefill_a8 applies to the slot engine only",
              flush=True)
    if args.paged and args.kv_bits not in (8, 32):
        raise SystemExit(f"--paged supports kv_bits 8 (int8 page pool) or "
                         f"32 (bf16 pages), not {args.kv_bits}")
    if args.paged and args.lm_head_bits != 16:
        print("note: --lm_head_bits applies to the slot engine only",
              flush=True)
    cfg, params = _load_model(args, w_bits=args.w_bits)
    if args.packed:
        params = llama.quantize_params_packed(params, cfg)
    if args.paged:
        from mxq_tpu.serving.paged import PagedEngine
        ps = 64
        # +1: page 0 is the reserved null page (PagedPool.create)
        pages = args.slots * (-(-args.max_len // ps)) + 1
        if args.kv_bits == 8:
            # the int8 pool pins page_size=128 (attn_int8.PAGE_INT8)
            ps = 128
            pages = args.slots * (-(-args.max_len // ps)) + 1
        e = PagedEngine(params, cfg, num_slots=args.slots,
                        total_pages=pages,
                        page_size=ps, max_len=args.max_len,
                        kv_bits=args.kv_bits,
                        greedy=args.temperature == 0.0,
                        temperature=args.temperature or 1.0,
                        top_k=args.top_k, top_p=args.top_p, seed=args.seed)
    else:
        e = eng.Engine(params, cfg, eng.EngineConfig(
            num_slots=args.slots, max_len=args.max_len,
            kv_quant=args.kv_bits < 32, prefill_a8=args.prefill_a8,
            lm_head_bits=args.lm_head_bits,
            greedy=args.temperature == 0.0,
            temperature=args.temperature or 1.0,
            top_k=args.top_k, top_p=args.top_p, seed=args.seed))
    rng = np.random.RandomState(0)
    reqs = [e.submit(rng.randint(0, cfg.vocab_size,
                                 size=args.prompt_len).astype(np.int32),
                     max_new_tokens=args.max_new_tokens)
            for _ in range(args.requests)]
    import time
    t0 = time.time()
    if args.spec_decode:
        from mxq_tpu.serving import spec
        if args.spec_sync:
            done = spec.run_spec(e, draft_len=args.draft_len)
        else:
            done = spec.run_spec_pipelined(e, draft_len=args.draft_len)
    else:
        done = e.run()
    dt = time.time() - t0
    total = sum(len(r.generated) for r in done)
    out = {"requests": len(done), "tokens": total,
           "tokens_per_sec": total / dt}
    if hasattr(e, "stats"):
        out["stats"] = {k: round(v, 4) if isinstance(v, float) else v
                        for k, v in e.stats().items()}
    print(json.dumps(out))


def _add_model_args(p):
    p.add_argument("--model", default=None,
                   help="HF checkpoint dir (else random init from --preset)")
    p.add_argument("--preset", default="tiny",
                   choices=["tiny", "llama2_7b", "llama2_13b", "llama2_70b"])
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mxq_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ptq")
    _add_model_args(p)
    p.add_argument("--dataset", default="wikitext2",
                   choices=["wikitext2", "c4", "ptb"])
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--mode", default="reference",
                   choices=["reference", "packed"])
    p.add_argument("--chunk", type=int, default=None,
                   help="calibration samples per device pass (bounds "
                        "activation residency; default: all at once)")
    p.add_argument("--shard", default=None, metavar="[DCN,]DP,FSDP,TP",
                   help="shard calibration over a device mesh, e.g. "
                        "'1,2,4' (activations over data axes, layer "
                        "weights over fsdp/tp — required for 13B/70B); "
                        "four values add a cross-host dcn axis")
    p.add_argument("--layers", type=int, default=None,
                   help="override preset depth (shallow drive of a "
                        "full-width config)")
    p.add_argument("--save_model", default=None)
    p.add_argument("--max_eval_windows", type=int, default=None)
    p.set_defaults(fn=cmd_ptq)

    p = sub.add_parser("prune")
    _add_model_args(p)
    p.add_argument("--dataset", default="wikitext2",
                   choices=["wikitext2", "c4", "ptb"])
    p.add_argument("--prune_method", default="wanda",
                   choices=["wanda", "magnitude", "sparsegpt"])
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--sparsity_type", default=None,
                   help="structured n:m, e.g. 2:4")
    p.add_argument("--nsamples", type=int, default=16)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--save_model", default=None)
    p.add_argument("--max_eval_windows", type=int, default=None)
    p.set_defaults(fn=cmd_prune)

    p = sub.add_parser("eval-ppl")
    _add_model_args(p)
    p.add_argument("--dataset", default="wikitext2",
                   choices=["wikitext2", "c4", "ptb"])
    p.add_argument("--w_bits", type=int, default=32)
    p.add_argument("--a_bits", type=int, default=32)
    p.add_argument("--kv_bits", type=int, default=32)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--max_eval_windows", type=int, default=None)
    p.set_defaults(fn=cmd_eval_ppl)

    p = sub.add_parser("eval-tasks")
    _add_model_args(p)
    p.add_argument("--w_bits", type=int, default=32)
    p.add_argument("--tasks", default="piqa,winogrande,hellaswag,arc_easy")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    # lmeval.py:52 --num_fewshot analogue (0 = the reference default)
    p.add_argument("--num_fewshot", type=int, default=0)
    # evaluator.make_table analogue (lmeval.py:153)
    p.add_argument("--table", action="store_true")
    p.set_defaults(fn=cmd_eval_tasks)

    p = sub.add_parser("train")
    _add_model_args(p)
    p.add_argument("--w_bits", type=int, default=2)   # run_train.sh arg 1
    p.add_argument("--a_bits", type=int, default=32)  # run_train.sh arg 2
    p.add_argument("--kv_bits", type=int, default=32) # run_train.sh arg 3
    p.add_argument("--use_kd", action="store_true", default=False)
    p.add_argument("--kd_loss_scale", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--block_size", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--train_data", default=None)
    p.add_argument("--output_dir", default="out/qat")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("generate-data")
    _add_model_args(p)
    p.add_argument("--chunk_id", type=int, default=0)
    p.add_argument("--num_seeds", type=int, default=16)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--out_dir", default="out/gen_data")
    p.add_argument("--merge", action="store_true")
    p.set_defaults(fn=cmd_generate_data)

    p = sub.add_parser("prune-vision")
    p.add_argument("--model", default="vit",
                   choices=("vit", "deit", "convnext", "mixer", "swin"))
    p.add_argument("--prune_metric", default="wanda",
                   choices=("wanda", "magnitude"))
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--nsamples", type=int, default=16)
    p.add_argument("--prune_n", type=int, default=0)
    p.add_argument("--prune_m", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_prune_vision)

    p = sub.add_parser("serve")
    _add_model_args(p)
    p.add_argument("--w_bits", type=int, default=32)
    p.add_argument("--kv_bits", type=int, default=8)
    p.add_argument("--packed", action="store_true")
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--prompt_len", type=int, default=8)
    p.add_argument("--prefill_a8", action="store_true")
    # packed uniform-4b lm_head (EngineConfig.lm_head_bits; 16 = off)
    p.add_argument("--lm_head_bits", type=int, default=16)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 samples with top_k/top_p")
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--spec_decode", action="store_true",
                   help="prompt-lookup speculative decoding (greedy; "
                        "pipelined device-side drafting by default)")
    p.add_argument("--spec_sync", action="store_true",
                   help="use the synchronous one-verify-per-round-trip "
                        "loop instead of the pipelined path")
    p.add_argument("--draft_len", type=int, default=4)
    p.add_argument("--paged", action="store_true",
                   help="vLLM-style paged engine instead of the slot engine")
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
