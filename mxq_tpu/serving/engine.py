"""Continuous-batching serving engine — beyond-reference capability (the
reference's CUDA GEMV was never wired to any serving loop, SURVEY.md §0.3).

Slot-based continuous batching: a fixed number of sequence slots share one
static-shape KV cache. Finished sequences free their slot; queued requests
prefill into free slots while other slots keep decoding. Two compiled
programs do all device work:

  * prefill(params, ids[1, T_bucket], slot)  — fills cache rows for one slot
  * decode_step(params, tokens[B, 1], positions[B]) — one token for every slot

The host-side scheduler (admit/retire/sample bookkeeping) is deliberately
thin; its native (C++) counterpart can replace it without touching the
compiled programs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.serving import kvcache


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray                  # [T] int32
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # filled by the engine:
    generated: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    num_slots: int = 8
    max_len: int = 2048
    prefill_buckets: tuple = (128, 512, 2048)
    kv_quant: bool = True               # int8 KV cache (kv_bits analogue)
    greedy: bool = True


class Engine:
    """Single-host continuous-batching engine over a (possibly packed) model."""

    def __init__(self, params, cfg: llama.LlamaConfig,
                 ecfg: EngineConfig = EngineConfig()):
        self.params = params
        self.cfg = cfg
        buckets = tuple(b for b in sorted(ecfg.prefill_buckets)
                        if b <= ecfg.max_len) or (ecfg.max_len,)
        ecfg = dataclasses.replace(ecfg, prefill_buckets=buckets)
        self.ecfg = ecfg
        nl, b = cfg.num_hidden_layers, ecfg.num_slots
        if ecfg.kv_quant:
            self.caches = kvcache.init_quant_cache(
                nl, b, ecfg.max_len, cfg.num_key_value_heads, cfg.head_dim)
        else:
            self.caches = llama.init_cache(cfg, b, ecfg.max_len)
        self.slot_req: list[Optional[Request]] = [None] * b
        self.slot_pos = np.zeros(b, np.int32)       # next write position
        self.queue: list[Request] = []
        self._uid = 0

        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,))
        self._prefill = {}

    # ---- compiled programs ----

    def _decode_impl(self, params, caches, tokens, positions, active):
        """One decode step for all slots. tokens [B,1], positions [B]."""
        cfg = self.cfg
        b = tokens.shape[0]
        # per-slot positions: forward() needs per-example cache_pos; we run
        # with cache_pos as a vector by exploiting that dynamic_update_slice
        # writes at a common offset — so instead gather per-slot via vmapped
        # single-slot forward would recompile; we use a common trick: write
        # position handled per-slot with one-hot masks is costly, so the
        # engine aligns decode so all slots write at their own position via
        # positions-aware attention mask and scatter.
        logits, caches = _forward_multipos(params, tokens, cfg, caches,
                                           positions)
        next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        next_tok = jnp.where(active, next_tok, 0)
        return next_tok, caches

    def _get_prefill(self, bucket: int):
        if bucket not in self._prefill:
            cfg = self.cfg

            @partial(jax.jit, static_argnames=("slot",), donate_argnums=(1,))
            def prefill(params, caches, ids, length, slot: int):
                sl = jax.tree_util.tree_map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1),
                    caches)
                t = ids.shape[1]
                s = (sl["k_codes"].shape[3] if "k_codes" in sl
                     else sl["k"].shape[2])
                # queries 0..t over full cache length s: causal + pad columns
                qpos = jnp.arange(t)[:, None]
                kpos = jnp.arange(s)[None, :]
                neg = jnp.finfo(jnp.float32).min
                mask = jnp.where((kpos <= qpos) & (kpos < length), 0.0, neg)
                logits, sl = llama.forward(
                    params, ids, cfg, caches=sl, cache_pos=0,
                    mask=mask[None, None])
                caches = jax.tree_util.tree_map(
                    lambda c, s: jax.lax.dynamic_update_slice_in_dim(
                        c, s.astype(c.dtype), slot, axis=1), caches, sl)
                last = jnp.argmax(logits[0, length - 1], axis=-1)
                return caches, last.astype(jnp.int32)

            self._prefill[bucket] = prefill
        return self._prefill[bucket]

    # ---- host-side scheduling ----

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 64,
               eos_token_id: Optional[int] = None) -> Request:
        req = Request(self._uid, np.asarray(prompt, np.int32), max_new_tokens,
                      eos_token_id)
        self._uid += 1
        self.queue.append(req)
        return req

    def _admit(self):
        for slot in range(self.ecfg.num_slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            t = len(req.prompt)
            bucket = next((bkt for bkt in self.ecfg.prefill_buckets
                           if bkt >= t), self.ecfg.prefill_buckets[-1])
            # Prompts longer than the largest bucket keep the LAST tokens
            # (the recent tail that conditions generation), never the head.
            tail = req.prompt[-bucket:]
            t = len(tail)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :t] = tail
            prefill = self._get_prefill(bucket)
            self.caches, first = prefill(self.params, self.caches,
                                         jnp.asarray(ids), t, slot)
            req.generated = [int(first)]
            self.slot_req[slot] = req
            self.slot_pos[slot] = t

    def step(self) -> list[Request]:
        """Admit waiting requests, run one decode step, retire finished ones.
        Returns the list of requests completed this step."""
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return []
        tokens = np.zeros((self.ecfg.num_slots, 1), np.int32)
        for s, r in enumerate(self.slot_req):
            if r is not None:
                tokens[s, 0] = r.generated[-1]
        next_tok, self.caches = self._decode(
            self.params, self.caches, jnp.asarray(tokens),
            jnp.asarray(self.slot_pos), jnp.asarray(active))
        next_np = np.asarray(next_tok)

        finished = []
        for s, r in enumerate(self.slot_req):
            if r is None:
                continue
            r.generated.append(int(next_np[s]))
            self.slot_pos[s] += 1
            hit_eos = (r.eos_token_id is not None
                       and r.generated[-1] == r.eos_token_id)
            if (len(r.generated) > r.max_new_tokens or hit_eos
                    or self.slot_pos[s] >= self.ecfg.max_len - 1):
                r.done = True
                finished.append(r)
                self.slot_req[s] = None
        return finished

    def run(self) -> list[Request]:
        """Drain queue + slots to completion."""
        done = []
        while self.queue or any(r is not None for r in self.slot_req):
            done.extend(self.step())
        return done


def _forward_multipos(params, tokens, cfg, caches, positions):
    """Decode forward where every slot writes its KV at its OWN position.

    lax.dynamic_update_slice needs a common offset, so per-slot writes use a
    one-hot scatter along the sequence axis instead (T=1 decode only).
    """
    b = tokens.shape[0]
    x = params["embed_tokens"][tokens]
    cos, sin = llama.rope_tables(cfg, positions[:, None].astype(jnp.float32))
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    quant = "k_codes" in caches
    s = caches["k_codes"].shape[3] if quant else caches["k"].shape[2]
    kpos = jnp.arange(s)[None, :]
    mask = jnp.where(kpos <= positions[:, None], 0.0,
                     jnp.finfo(jnp.float32).min)[:, None, None, :]

    from mxq_tpu.packfmt import PackedMXQLinear
    layer_params = params["layers"]
    packed_names = [k for k, v in layer_params.items()
                    if isinstance(v, PackedMXQLinear)]
    dense_stacks = {k: v for k, v in layer_params.items()
                    if k not in packed_names}

    def body(x, inputs):
        idx, dense_sl, cache = inputs
        layer = dict(dense_sl)
        for nm in packed_names:
            layer[nm] = llama.StackedPackedRef(layer_params[nm], idx)
        h = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        b_, t, _ = h.shape
        nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        if "qkv_proj" in layer:
            qkv = llama.quant_linear(h, layer["qkv_proj"], cfg)
            q = qkv[..., : nh * d].reshape(b_, t, nh, d)
            k = qkv[..., nh * d: (nh + nkv) * d].reshape(b_, t, nkv, d)
            v = qkv[..., (nh + nkv) * d:].reshape(b_, t, nkv, d)
        else:
            q = llama.quant_linear(h, layer["q_proj"], cfg).reshape(b_, t, nh, d)
            k = llama.quant_linear(h, layer["k_proj"], cfg).reshape(b_, t, nkv, d)
            v = llama.quant_linear(h, layer["v_proj"], cfg).reshape(b_, t, nkv, d)
        q, k = llama.apply_rope(q, k, cos, sin)

        if quant:
            # head-major int8 cache: codes [B, H, S, D], scales [B, H, S].
            # Each slot's one new token lands at its OWN position via an
            # indexed scatter (writes B rows, not a one-hot cache rewrite).
            kc, ks = kvcache.quantize_kv_headmajor(k)   # [B,H,1,D], [B,H,1]
            vc, vs = kvcache.quantize_kv_headmajor(v)
            rows = jnp.arange(b_)

            def scat_c(buf, val):
                return buf.at[rows, :, positions].set(
                    val[:, :, 0].astype(buf.dtype))

            def scat_s(buf, val):
                return buf.at[rows, :, positions].set(
                    val[:, :, 0].astype(buf.dtype))

            cache = {
                "k_codes": scat_c(cache["k_codes"], kc),
                "k_scale": scat_s(cache["k_scale"], ks),
                "v_codes": scat_c(cache["v_codes"], vc),
                "v_scale": scat_s(cache["v_scale"], vs),
            }
            # fused decode attention straight off the int8 codes
            from mxq_tpu.ops import attn_int8 as _a8
            ctx = _a8.int8_decode_attention(
                q[:, 0], cache["k_codes"], cache["k_scale"],
                cache["v_codes"], cache["v_scale"], positions)
            ctx = ctx.reshape(b_, t, nh * d).astype(x.dtype)
        else:
            def scatter(buf, val):
                # buf [B, S, H, D], val [B, 1, H, D]
                return buf.at[jnp.arange(buf.shape[0]), positions].set(
                    val[:, 0].astype(buf.dtype))

            cache = {"k": scatter(cache["k"], k),
                     "v": scatter(cache["v"], v)}
            kk, vv = cache["k"], cache["v"]
            if nkv != nh:
                rep = nh // nkv
                kk = jnp.repeat(kk, rep, axis=2)
                vv = jnp.repeat(vv, rep, axis=2)
            qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)
            kf = kk.transpose(0, 2, 1, 3).astype(jnp.float32)
            vf = vv.transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(d)
            probs = jax.nn.softmax(scores + mask, axis=-1).astype(vf.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", probs, vf)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, t, nh * d).astype(
                x.dtype)
        x = x + llama.quant_linear(ctx, layer["o_proj"], cfg)
        h2 = llama.rms_norm(x, layer["post_attention_layernorm"],
                            cfg.rms_norm_eps)
        x = x + llama.mlp(h2, layer, cfg)
        return x, cache

    nl = cfg.num_hidden_layers
    x, new_caches = jax.lax.scan(
        body, x, (jnp.arange(nl, dtype=jnp.int32), dense_stacks, caches))
    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    logits = (x @ head) if head is not None else (x @ params["embed_tokens"].T)
    return logits.astype(jnp.float32), new_caches
