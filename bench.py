"""Driver benchmark: Llama-2-7B-shaped MXQ packed decode throughput on one TPU
chip vs a bf16 dense baseline.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_chip_7b_mxq", "value": N,
   "unit": "tok/s", "vs_baseline": speedup_vs_bf16}

The bf16 baseline is measured at reduced depth (HBM cannot hold 7B bf16 +
cache alongside) and extrapolated linearly in layer count, which is sound for
decode (per-layer cost is depth-independent).
"""

import json
import sys
import os
import threading

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _arm_watchdog(seconds: float, stage: str):
    """Emit the JSON line and hard-exit if the stage never completes.

    The tunneled TPU's relay can wedge so that device->host transfers hang
    forever (docs/RESULTS.md r4 incident) — a silently hung bench records
    NOTHING for the round, so a deadline that still emits a parseable
    error line is strictly better. Cancel on success."""
    def fire():
        print(json.dumps({
            "metric": "decode_tokens_per_sec_chip_7b_mxq",
            "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
            "error": f"watchdog: stage {stage!r} exceeded {seconds:.0f}s "
                     "(TPU relay wedge?)"}), flush=True)
        os._exit(2)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t

from mxq_tpu.models import llama
from mxq_tpu import packfmt
from mxq_tpu.packfmt import PackedMXQLinear, NB_TILE, N_LANE
from mxq_tpu.utils.benchlib import time_op

BATCH = 8
CACHE_LEN = 256


def random_packed_linear(key, k, o):
    """Random packed weights directly (no quantization pass needed to bench)."""
    nbp = -(-(k // 64) // NB_TILE) * NB_TILE
    n = -(-o // N_LANE) * N_LANE
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    maxi = jnp.iinfo(jnp.int32)
    return PackedMXQLinear(
        w2=jax.random.randint(k1, (nbp * 3, n), maxi.min, maxi.max, jnp.int32),
        w4=jax.random.randint(k2, (nbp * 2, n), maxi.min, maxi.max, jnp.int32),
        meta2=jax.random.randint(k3, (nbp, n), 0, 1 << 30, jnp.int32),
        qscale=(jnp.abs(jax.random.normal(k4, (nbp, n))) * 1e-4).astype(jnp.bfloat16),
        qmin=(jnp.abs(jax.random.normal(k5, (nbp, n))) * 1e-3).astype(jnp.bfloat16),
        smeta4=jnp.concatenate([jnp.full((1, n), 1e-2, jnp.float32),
                                jnp.full((1, n), 7.0, jnp.float32),
                                jnp.zeros((6, n), jnp.float32)]),
        in_features=k, out_features=o)


def packed_params(cfg, key):
    # fused layout (qkv + gate_up) — what quantize_params_packed(fuse=True)
    # produces for the serving path
    shapes = llama._linear_shapes(cfg)
    h = cfg.hidden_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    fused = {
        "qkv_proj": (h, h + 2 * kv),
        "gate_up_proj": (h, 2 * cfg.intermediate_size),
        "o_proj": shapes["o_proj"],
        "down_proj": shapes["down_proj"],
    }
    keys = jax.random.split(key, len(fused) + 2)
    layers = {}
    for i, (name, (kin, out)) in enumerate(fused.items()):
        mk = jax.random.split(keys[i], cfg.num_hidden_layers)
        layers[name] = jax.vmap(lambda kk: random_packed_linear(kk, kin, out))(mk)
    h = cfg.hidden_size
    layers["input_layernorm"] = jnp.ones((cfg.num_hidden_layers, h), jnp.bfloat16)
    layers["post_attention_layernorm"] = jnp.ones((cfg.num_hidden_layers, h), jnp.bfloat16)
    return {
        "embed_tokens": (jax.random.normal(keys[-2], (cfg.vocab_size, h)) * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": (jax.random.normal(keys[-1], (h, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
    }


def decode_step_fn(cfg):
    def step(params, carry):
        logits, caches = llama.forward(
            params, carry["ids"], cfg,
            caches=carry["caches"], cache_pos=carry["pos"])
        ids = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        pos = (carry["pos"] + 1) % (CACHE_LEN - 1)
        return dict(ids=ids, caches=caches, pos=pos)
    return step


def bench_decode(cfg, params, kv_quant=False):
    if kv_quant:
        from mxq_tpu.serving import kvcache
        caches = kvcache.init_quant_cache(
            cfg.num_hidden_layers, BATCH, CACHE_LEN,
            cfg.num_key_value_heads, cfg.head_dim)
    else:
        caches = llama.init_cache(cfg, BATCH, CACHE_LEN)
    carry = dict(ids=jnp.zeros((BATCH, 1), jnp.int32),
                 caches=caches, pos=jnp.int32(0))
    t = time_op(decode_step_fn(cfg), carry, reps=3, const=params)
    del carry
    return t


def autotune_layout(key):
    """Time each GEMV unpack layout on a decode-critical shape and return
    (winner_among_exact, all_times). The headline layout is the fastest
    EXACT layout (slab/quad, both bit-consistent with the reference
    dequant); bfexp (bf16 multiply-sub precision, measured ppl-neutral —
    docs/RESULTS.md) is timed and reported as available upside."""
    from mxq_tpu.ops import mxq_matmul as mm
    from mxq_tpu.utils.benchlib import fold_to_input
    k = 4096
    p = random_packed_linear(key, k, 11008)
    xb = jnp.ones((BATCH, k), jnp.bfloat16)
    xr = jax.random.normal(key, (BATCH, k), jnp.float32)
    # On-device numeric parity gate: every layout (slab included) must match
    # the exact dequant-then-matmul reference before its timing can win the
    # headline. Tolerance: the MXU rounds the f32 dequantized weights to
    # bf16 inside dot_general at default precision, which costs ~4.7e-3
    # max-rel (measured; under precision=float32 every layout agrees with
    # the f64 reference to ~3e-7 — tools/probe_quad_parity.py). The 2e-2
    # gate sits above that rounding envelope and far below the O(1) error a
    # byte-order / lowering bug would produce. The round-2 gate compared
    # quad against slab at 2e-3 — tighter than two INDEPENDENT bf16 dot
    # roundings can satisfy — which is why quad spuriously "failed" on
    # device (BENCH_r02).
    wd = mm.mxq_dequant_weight(p).astype(jnp.float32)     # [K, N] exact
    y_ref = jnp.dot(xr.astype(jnp.bfloat16).astype(jnp.float32),
                    wd[:, : p.out_features], precision="highest")
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
    del wd

    # AWQ-style uniform-4b baseline at the same shape — the reference's
    # three-way comparison axis (test_mxq_gemv.py:57-80: fp16 vs awq_4bit
    # vs mxq_2.8bit)
    from mxq_tpu.ops import uniform4 as u4
    wu = jax.random.normal(key, (11008, k), jnp.float32) * 0.02
    pu = u4.quantize_pack_u4(wu)
    del wu

    times = {}

    def step_u4(c, x):
        return fold_to_input(u4.u4_matmul(x, c), k)

    try:
        times["uniform4b"] = time_op(step_u4, xb, const=pu)
    except Exception as e:  # noqa: BLE001
        times["uniform4b"] = float("inf")
        times["uniform4b_error"] = f"{type(e).__name__}: {e}"[:120]
    del pu

    # uniform 2-bit g128 baseline — the reference's third kernel
    # (gemv_cuda.cu:259-345, compiled but never exposed by its pybind
    # dispatch); completes the four-way bf16/u4/u2/mxq table
    wu2 = jax.random.normal(key, (11008, k), jnp.float32) * 0.02
    pu2 = u4.quantize_pack_u2(wu2)
    del wu2

    def step_u2(c, x):
        return fold_to_input(u4.u2_matmul(x, c), k)

    try:
        times["uniform2b"] = time_op(step_u2, xb, const=pu2)
    except Exception as e:  # noqa: BLE001
        times["uniform2b"] = float("inf")
        times["uniform2b_error"] = f"{type(e).__name__}: {e}"[:120]
    del pu2

    # B=1 single-stream row: the bdg body (MXU group-partial reduction,
    # auto-dispatched at batch 1 — docs/ROOFLINE.md) vs slab at B=1
    x1 = jnp.ones((1, k), jnp.bfloat16)
    for nm, lay in (("b1_bdg", "bdg"), ("b1_slab", "slab")):
        def step1(c, x, _l=lay):
            return fold_to_input(mm.mxq_matmul(x, c, layout=_l), k)
        try:
            times[nm] = time_op(step1, x1, const=p)
        except Exception as e:  # noqa: BLE001
            times[nm] = float("inf")
            times[nm + "_error"] = f"{type(e).__name__}: {e}"[:120]

    for layout in ("slab", "quad", "bfexp"):
        def stepl(c, x, _l=layout):
            return fold_to_input(mm.mxq_matmul(x, c, layout=_l), k)
        try:
            y = mm.mxq_matmul(xr, p, layout=layout)
            rel = float(jnp.max(jnp.abs(y - y_ref))) / scale
            tol = 0.02 if layout != "bfexp" else 0.05
            if rel > tol:
                raise ValueError(f"parity vs dequant ref rel={rel:.2e}")
            times[layout + "_relerr"] = rel
            times[layout] = time_op(stepl, xb, const=p)
        except Exception as e:  # noqa: BLE001 — a layout that fails to
            # compile or match on this backend drops out of the tuning
            times[layout] = float("inf")
            times[layout + "_error"] = f"{type(e).__name__}: {e}"[:120]
    del p, xb, xr, y_ref
    jax.clear_caches()
    winner = min(("slab", "quad"), key=lambda l: times[l])
    return winner, times


def bench_paged_kv8(cfg, params):
    """One paged decode step (horizon-1 chunk, folded int8 pool) at the
    SAME batch/window as the slot-engine headline — the paged-vs-slot A/B
    the r4 VERDICT asked for (the r4 layout was knowingly slower)."""
    from mxq_tpu.serving import paged as pg
    slots = BATCH
    pool = pg.PagedPool.create(cfg, slots, total_pages=2 * slots + 2,
                               max_len=CACHE_LEN, kv_bits=8)
    for s in range(slots):
        pool.ensure_capacity(s, CACHE_LEN)
        pool.lengths[s] = CACHE_LEN - 1
    const = dict(
        params=params,
        use_chain=jnp.zeros((slots,), bool),
        positions=jnp.array(pool.lengths.astype(np.int32) - 1),
        active=jnp.ones((slots,), bool),
        tables=jnp.array(pool.page_tables))
    carry = dict(k=pool.k_pages, v=pool.v_pages,
                 toks=jnp.zeros((slots,), jnp.int32))

    def stepp(c, carry):
        toks, kp, vp = pg.paged_decode_chunk(
            c["params"], carry["k"], carry["v"], carry["toks"],
            carry["toks"], c["use_chain"], c["positions"], c["active"],
            c["tables"], jax.random.PRNGKey(0), cfg, 1)
        return dict(k=kp, v=vp, toks=toks[-1])

    return time_op(stepp, carry, const=const)


def bench_training(key):
    """KD-QAT training rows (the reference's flagship flow,
    LLM-QAT/run_train.sh): step time / tokens/s/chip / MFU at the largest
    7B-width depth that fits, isolating the fake-quant STE cost
    (bf16 vs qat-w2) and the remat cost."""
    import dataclasses as _dc
    from mxq_tpu.qat import train as qtrain

    seq, bs = 2048, 1
    out = {}
    import gc
    for depth in (4, 2):
        params = teacher = opt_state = batch = None
        try:
            cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=depth)
            params = llama.init_params(cfg, key, dtype=jnp.bfloat16)
            n_params = sum(int(l.size) for l in
                           jax.tree_util.tree_leaves(params))
            batch = {"input_ids": jax.random.randint(
                jax.random.fold_in(key, 2), (bs, seq), 1, cfg.vocab_size,
                jnp.int32)}
            rows = {}
            configs = [
                ("bf16_remat", 32, False, True),
                ("qat_w2_remat", 2, False, True),
                ("qat_w2_noremat", 2, False, False),
                ("kd_qat_w2_remat", 2, True, True),
            ]
            for name, w_bits, use_kd, remat in configs:
                ccfg = _dc.replace(cfg, w_bits=w_bits)
                tc = qtrain.TrainConfig(use_kd=use_kd, remat=remat)
                opt = qtrain.make_optimizer(tc)
                opt_state = opt.init(params)
                step = jax.jit(qtrain.make_train_step(ccfg, tc, opt))
                # teacher only for the KD row (an always-resident teacher
                # pushed the depth-2 peak past HBM in the r5 shakeout)
                teacher = (llama.init_params(cfg, jax.random.fold_in(key, 1),
                                             dtype=jnp.bfloat16)
                           if use_kd else None)

                def stepb(c, x, _s=step):
                    p2, o2, _ = _s(x[0], c["teacher"], x[1], c["batch"])
                    return (p2, o2)

                try:
                    t = time_op(stepb, (params, opt_state),
                                const=dict(teacher=teacher, batch=batch),
                                iters_lo=2, iters_hi=6, reps=2)
                    # fwd 2PT + bwd 4PT (+ teacher fwd 2PT under KD)
                    flops = (8 if use_kd else 6) * n_params * bs * seq
                    rows[name] = {
                        "ms_per_step": round(t * 1e3, 2),
                        "tokens_per_sec_chip": round(bs * seq / t, 1),
                        "mfu": round(flops / (t * 197e12), 4),
                    }
                except Exception as e:      # noqa: BLE001
                    rows[name] = {"error": f"{type(e).__name__}: {e}"[:120]}
                opt_state = teacher = None
                gc.collect()
                jax.clear_caches()
            out = {"depth": depth, "seq": seq, "batch": bs,
                   "n_params": n_params, "rows": rows}
            if any("error" not in r for r in rows.values()):
                break
        except Exception as e:              # noqa: BLE001 — try shallower
            out = {"depth": depth,
                   "error": f"{type(e).__name__}: {e}"[:160]}
        finally:
            # an OOM at this depth must not poison the shallower retry:
            # the locals pin multi-GB device buffers (the r5 shakeout's
            # depth-2 OOM was depth-4's params still referenced)
            params = teacher = opt_state = batch = None
            gc.collect()
            jax.clear_caches()
    return out


def main(_retry=True):
    wd = None
    try:
        # stage 1: a tiny d2h transfer proves the relay is alive (5 min —
        # generous for a cold backend or a slow relay window) before the long run
        wd = _arm_watchdog(600, "relay-sanity")
        _ = float(jnp.sum(jnp.ones((8, 128))))
        wd.cancel()
        # stage 2: the whole bench must land inside the driver's patience
        # (r5 adds paged A/B + 4 training rows; r4's full run took ~19 min)
        wd = _arm_watchdog(3000, "full-bench")
        key = jax.random.PRNGKey(0)
        from mxq_tpu.ops import mxq_matmul as mm
        layout, layout_times = autotune_layout(key)
        mm.GEMV_LAYOUT = layout

        # training rows FIRST: the KD configs need the most contiguous
        # HBM (params + teacher + adam moments), and running them after
        # the decode stages OOMed at depth 2 from fragmentation
        # (RESOURCE_EXHAUSTED in the r5 shakeout run)
        import gc
        gc.collect()
        jax.clear_caches()
        training = bench_training(key)
        gc.collect()
        jax.clear_caches()

        # bf16 dense baseline at reduced depth, extrapolated to 32 layers.
        t_dense = {}
        for nl in (8, 16):
            cfg = llama.LlamaConfig.llama2_7b(num_hidden_layers=nl)
            params = llama.init_params(cfg, key, dtype=jnp.bfloat16)
            t_dense[nl] = bench_decode(cfg, params)
            del params
            jax.clear_caches()
        per_layer = (t_dense[16] - t_dense[8]) / 8.0
        t_bf16_32 = t_dense[16] + 16 * per_layer

        cfg = llama.LlamaConfig.llama2_7b()
        params = packed_params(cfg, key)

        # physical floor: one decode step must read every weight byte once;
        # relay hiccups can corrupt time_op's trip-differencing into
        # impossibly LOW samples (a 2.3 ms "7B step" was observed), which
        # min() would otherwise promote to the headline
        wbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(
            {"layers": params["layers"], "lm_head": params["lm_head"]}))
        t_floor = 0.9 * wbytes / 819e9

        def bench_kv8():
            t = bench_decode(cfg, params, kv_quant=True)
            if t < t_floor:     # impossible sample — measure once more
                t2 = bench_decode(cfg, params, kv_quant=True)
                t = t2 if t2 >= t_floor else max(t, t2)
            return t

        t_mxq = bench_decode(cfg, params)
        # The headline is the SERVING configuration: W2.8 weights + int8 KV
        # cache. KV bit-width is part of the reference's own config grid
        # (the LLM-QAT W-A-KV table; kv_bits fake-quant at
        # modeling_llama_quant.py:323-329) — here it is a real int8 cache
        # consumed by the fused decode attention. The bf16-KV step (the
        # r1/r2 protocol) is kept in detail for cross-round comparability;
        # the bf16 dense baseline keeps its bf16 cache either way.
        t_kv8 = bench_kv8()

        # A/B/C the t==1 cache-write strategy: fused in-kernel aliased
        # writes / folded-read + deferred commits / r3 layer-view +
        # deferred commits. All exact; the fastest wins the headline.
        from mxq_tpu.ops import attn_int8 as _a8
        t_path = {_a8.WRITE_PATH: t_kv8}
        for pathname in ("fused", "folded", "deferred"):
            if pathname in t_path:
                continue
            _a8.WRITE_PATH = pathname
            jax.clear_caches()
            try:
                t_path[pathname] = bench_kv8()
            except Exception as e:      # noqa: BLE001 — report, keep going
                t_path[pathname] = float("inf")
                t_path[pathname + "_error"] = f"{type(e).__name__}: {e}"[:120]
        best = min((p for p in ("fused", "folded", "deferred")),
                   key=lambda p: t_path[p])
        _a8.WRITE_PATH = best
        jax.clear_caches()
        # decode-step timings through the relay swing 10-25% between
        # minutes-apart windows (docs/RESULTS.md r4); a second sample of
        # the winner and min() guards the headline against one bad window
        t_path[best + "_rerun"] = bench_kv8()
        t_kv8 = min(t_path[best], t_path[best + "_rerun"])

        # detail row: opt-in packed uniform-4b lm_head
        # (EngineConfig.lm_head_bits=4) — 4x fewer vocab-matmul weight
        # bytes on top of the headline config
        from mxq_tpu.ops import uniform4
        params_u4h = dict(params, lm_head=uniform4.quantize_pack_u4(
            jnp.asarray(params["lm_head"]).T))
        t_kv8_u4h = bench_decode(cfg, params_u4h, kv_quant=True)
        del params_u4h

        # paged-vs-slot A/B (folded pool layout, r5): one paged decode
        # step at the same batch/window as the kv8 headline
        try:
            t_paged = bench_paged_kv8(cfg, params)
        except Exception as e:              # noqa: BLE001
            t_paged = float("inf")
            paged_err = f"{type(e).__name__}: {e}"[:160]
        else:
            paged_err = None
        jax.clear_caches()

        del params
        jax.clear_caches()

        toks = BATCH / t_kv8
        speedup = t_bf16_32 / t_kv8
        print(json.dumps({
            "metric": "decode_tokens_per_sec_chip_7b_mxq",
            "value": round(toks, 2),
            "unit": "tok/s",
            "vs_baseline": round(speedup, 3),
            "detail": {
                "batch": BATCH,
                "headline_config": "W2.8-packed + int8-KV (kv_bits=8)",
                "gemv_layout": layout,
                # non-finite timings serialize as null (RFC-8259: bare
                # Infinity is not valid JSON); the *_error key explains why
                "layout_us_4096x11008_b8": {
                    k: (None if isinstance(v, float) and not np.isfinite(v)
                        else f"{v:.2e}" if k.endswith("_relerr")
                        else round(v * 1e6, 1) if isinstance(v, float)
                        else v)
                    for k, v in layout_times.items()},
                "t_step_mxq_kv8_ms": (round(t_kv8 * 1e3, 3)
                                      if np.isfinite(t_kv8) else None),
                "kv8_write_path": best,
                "kv8_write_paths_ms": {
                    k: (round(v * 1e3, 3)
                        if isinstance(v, float) and np.isfinite(v)
                        else v if isinstance(v, str) else None)
                    for k, v in t_path.items()},
                "t_step_mxq_kv8_u4head_ms": (
                    round(t_kv8_u4h * 1e3, 3)
                    if np.isfinite(t_kv8_u4h) else None),
                "tok_s_chip_kv8_u4head": (
                    round(BATCH / t_kv8_u4h, 1)
                    if np.isfinite(t_kv8_u4h) and t_kv8_u4h > 0 else None),
                # the r1/r2 protocol row (bf16 KV cache), for comparability
                "t_step_mxq_bf16kv_ms": round(t_mxq * 1e3, 3),
                "tok_s_chip_bf16kv": round(BATCH / t_mxq, 1),
                "t_step_bf16_32L_extrapolated_ms": round(t_bf16_32 * 1e3, 3),
                "bf16_depths_measured": {str(k): round(v * 1e3, 3)
                                         for k, v in t_dense.items()},
                # paged-vs-slot decode A/B (folded pool, r5): ratio <= ~1.05
                # is the VERDICT r4 parity bar
                "t_step_paged_kv8_ms": (round(t_paged * 1e3, 3)
                                        if np.isfinite(t_paged) else None),
                "paged_vs_slot_ratio": (round(t_paged / t_kv8, 3)
                                        if np.isfinite(t_paged) else None),
                **({"paged_error": paged_err} if paged_err else {}),
                # KD-QAT training rows (7B width; per-config ms/step,
                # tok/s/chip, MFU)
                "training": training,
            },
        }))
        wd.cancel()
    except Exception as e:  # noqa: BLE001 — bench must always emit a JSON line
        if wd is not None:
            wd.cancel()     # a stale deadline must not kill the retry
        if _retry:
            # transient device-state failures (e.g. stale HBM from a killed
            # predecessor) clear on a fresh attempt
            import gc
            gc.collect()
            jax.clear_caches()
            return main(_retry=False)
        print(json.dumps({
            "metric": "decode_tokens_per_sec_chip_7b_mxq",
            "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        raise


if __name__ == "__main__":
    main()
