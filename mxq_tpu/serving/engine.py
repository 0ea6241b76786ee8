"""Continuous-batching serving engine — beyond-reference capability (the
reference's CUDA GEMV was never wired to any serving loop, SURVEY.md §0.3).

Slot-based continuous batching: a fixed number of sequence slots share one
static-shape KV cache. Finished sequences free their slot; queued requests
prefill into free slots while other slots keep decoding. Two compiled
programs do all device work:

  * prefill(params, ids[1, T_bucket], slot)   — fills cache rows for one slot
  * decode_chunk(params, tokens, positions, active, horizon) — ``horizon``
    greedy tokens for every slot in one dispatch (lax.scan on device)

Host-side scheduling (admit/retire/EOS bookkeeping) lives in the C++
scheduler (runtime/csrc/mxq_runtime.cc, via runtime.native.NativeScheduler),
with a semantics-identical Python fallback when the native lib is absent.

The run loop is PIPELINED: chunk k+1 is dispatched before chunk k's tokens
are fetched, with the next chunk's input tokens chained on-device from the
in-flight chunk's output. The host fetch + bookkeeping of chunk k then
overlaps chunk k+1's device compute, so wall-clock/step approaches the
device step time instead of device + RTT + host (round-1 engine: 65 ms wall
vs 11.4 ms device through the relay, docs/RESULTS.md).
"""

from __future__ import annotations

import dataclasses
import time
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
    # host-clock observability (seconds, time.monotonic):
    t_submit: float = 0.0
    t_first: float = 0.0                # first token observed (TTFT anchor)
    t_done: float = 0.0


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    num_slots: int = 8
    max_len: int = 2048
    prefill_buckets: tuple = (128, 512, 2048)
    kv_quant: bool = True               # int8 KV cache (kv_bits analogue)
    # greedy=False samples on-device with the knobs below (the reference's
    # generation plumbing, modeling_llama_quant.py:911-956 via HF generate);
    # top_k=1 reduces to greedy exactly.
    greedy: bool = True
    temperature: float = 1.0
    top_k: int = 0                      # 0 = no top-k filter
    top_p: float = 1.0                  # 1.0 = no nucleus filter
    seed: int = 0
    horizon: int = 8                    # decode steps per device dispatch
    # route prefill matmuls through int8 MXU dots (W~4A8) — ~2x the bf16 MXU
    # rate; the reference's a_bits=8 choice applied to the serving prefill
    # (ops/mxq_matmul.py A8 section). Decode is unaffected.
    prefill_a8: bool = False
    # quantize lm_head to packed uniform-4b at engine init (4x fewer
    # vocab-matmul weight bytes per decode step). 16 = off (the
    # reference's choice: it never quantizes lm_head).
    lm_head_bits: int = 16


def sample_token(logits: jax.Array, key, greedy: bool, temperature: float,
                 top_k: int, top_p: float) -> jax.Array:
    """Next token from [B, V] logits: argmax when greedy, else
    temperature/top-k/top-p sampling on device (shared by Engine and
    PagedEngine). The filter knobs are trace-time constants."""
    if greedy or top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    neg = jnp.finfo(jnp.float32).min
    if top_k > 0:
        kth = jax.lax.top_k(lg, top_k)[0][:, -1:]
        lg = jnp.where(lg < kth, neg, lg)
    if top_p < 1.0:
        srt = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose prefix mass (exclusive) < top_p
        keep = (csum - probs) < top_p
        cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        lg = jnp.where(lg < cutoff, neg, lg)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


class _PyScheduler:
    """Python fallback with the exact semantics of the C++ scheduler
    (runtime/csrc/mxq_runtime.cc): slot admission, per-token retirement on
    EOS / max_new_tokens / cache-full."""

    def __init__(self, num_slots: int, max_len: int):
        self.num_slots, self.max_len = num_slots, max_len
        self._slot = [None] * num_slots     # per-slot dict or None
        self._pos = [0] * num_slots
        self._queue: list[dict] = []
        self.completed = 0

    def submit(self, uid, prompt_len, max_new_tokens, eos_token=-1):
        self._queue.append(dict(uid=uid, plen=prompt_len,
                                max_new=max_new_tokens, eos=eos_token,
                                generated=0))

    def admit(self):
        out = []
        for i in range(self.num_slots):
            if self._slot[i] is not None or not self._queue:
                continue
            r = self._queue.pop(0)
            self._slot[i] = r
            self._pos[i] = r["plen"]
            out.append((i, r["uid"], r["plen"]))
        return out

    def on_token(self, slot: int, token: int) -> bool:
        r = self._slot[slot]
        r["generated"] += 1
        if r["generated"] > 1:          # first token came from prefill
            self._pos[slot] += 1
        hit_eos = r["eos"] >= 0 and token == r["eos"]
        full = self._pos[slot] >= self.max_len - 1
        if r["generated"] >= r["max_new"] or hit_eos or full:
            self._slot[slot] = None
            self.completed += 1
            return True
        return False

    def cancel(self, uid: int) -> int:
        """Cancel by uid: freed slot index, -1 if dequeued, -2 if unknown."""
        for i in range(self.num_slots):
            if self._slot[i] is not None and self._slot[i]["uid"] == uid:
                self._slot[i] = None
                return i
        for j, r in enumerate(self._queue):
            if r["uid"] == uid:
                del self._queue[j]
                return -1
        return -2

    @property
    def pending(self) -> int:
        return len(self._queue)


def _make_scheduler(num_slots: int, max_len: int):
    from mxq_tpu.runtime import native
    try:
        return native.NativeScheduler(num_slots, max_len)
    except Exception:
        return _PyScheduler(num_slots, max_len)


class Engine:
    """Single-host continuous-batching engine over a (possibly packed) model."""

    def __init__(self, params, cfg: llama.LlamaConfig,
                 ecfg: EngineConfig = EngineConfig()):
        self.params = params
        if ecfg.lm_head_bits == 4 and not isinstance(
                params.get("lm_head"), type(None)) and not hasattr(
                params["lm_head"], "w"):
            from mxq_tpu.ops import uniform4
            # lm_head is stored [hidden, vocab] (x @ head);
            # quantize_pack_u4 wants [O, K]
            self.params = dict(params, lm_head=uniform4.quantize_pack_u4(
                jnp.asarray(params["lm_head"]).T))
        if ecfg.prefill_a8:
            cfg = dataclasses.replace(cfg, prefill_act_bits=8)
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
        self._sched = _make_scheduler(b, ecfg.max_len)
        self._reqs: dict[int, Request] = {}
        self._slot_uid: list[Optional[int]] = [None] * b
        self._pos = np.zeros(b, np.int32)        # dispatch-time write position
        self._last_tok = np.zeros(b, np.int32)   # host-known last token/slot
        self._admit_gen = np.zeros(b, np.int64)  # bumps on each admission
        self._inflight = None
        self._uid = 0
        self._chunk_no = 0                       # PRNG stream for sampling
        self._pending_first = {}                 # slot -> device first token
        self._stream_buf = None                  # set by stream()
        # speculative-decoding acceptance accounting (filled by spec.run_spec
        # / run_spec_pipelined): rounds = verify rounds, accepted = tokens
        # emitted, dispatches = host->device launches
        self._spec_stats = {"rounds": 0, "accepted": 0, "dispatches": 0}
        self._key_decode, self._key_prefill = jax.random.split(
            jax.random.PRNGKey(ecfg.seed))

        self._decode = jax.jit(self._decode_chunk_impl, donate_argnums=(1,),
                               static_argnames=("horizon",))
        self._prefill = {}

    # ---- compiled programs ----

    def _pick(self, logits: jax.Array, key) -> jax.Array:
        e = self.ecfg
        return sample_token(logits, key, e.greedy, e.temperature, e.top_k,
                            e.top_p)

    def _decode_chunk_impl(self, params, caches, chained, host_toks,
                           use_chain, positions, active, key,
                           horizon: int):
        """``horizon`` decode steps for all slots in one dispatch (greedy or
        sampled per EngineConfig).

        ``chained`` [B] is the previous chunk's last token (still on device,
        never fetched); ``host_toks`` [B] overrides it where ``use_chain`` is
        False (freshly admitted slots whose first token came from prefill).
        Returns tokens [horizon, B] + updated caches.
        """
        cfg = self.cfg
        toks = jnp.where(use_chain, chained, host_toks)[:, None]
        max_len = self.ecfg.max_len

        def sub(carry, i):
            toks, caches = carry
            # NEAR-CAPACITY CLAMP: a slot admitted at plen = max_len-1 gets
            # `horizon` steps dispatched with a fixed active mask, so later
            # steps would write KV at positions >= max_len — past the cache
            # and past the fused write kernel's own invariant
            # (ops/attn_int8.py "Requires S > max(positions)"). Clamp the
            # write row to the last one (the slot is retired by host
            # bookkeeping after its real last token, so the re-written row
            # is never read: attention masks rows > pos and a later
            # occupant overwrites before reading) and zero the overflow
            # steps' tokens like inactive slots'.
            in_range = positions + i < max_len
            pos_i = jnp.where(in_range, positions + i, max_len - 1)
            logits, caches = _forward_multipos(params, toks, cfg, caches,
                                               pos_i)
            nxt = self._pick(logits[:, -1], jax.random.fold_in(key, i))
            nxt = jnp.where(active & in_range, nxt, 0)
            return (nxt[:, None], caches), nxt

        (_, caches), all_toks = jax.lax.scan(
            sub, (toks, caches), jnp.arange(horizon, dtype=jnp.int32))
        return all_toks, caches

    def _get_prefill(self, bucket: int):
        if bucket not in self._prefill:
            cfg = self.cfg

            @partial(jax.jit, static_argnames=("slot",), donate_argnums=(1,))
            def prefill(params, caches, ids, length, key, slot: int):
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
                last = self._pick(logits[0:1, length - 1], key)[0]
                return caches, last.astype(jnp.int32)

            self._prefill[bucket] = prefill
        return self._prefill[bucket]

    def _get_prefill_chunk(self, bucket: int):
        """Continuation-chunk prefill: like _get_prefill but writing at a
        traced cache offset, so prompts longer than the largest bucket are
        prefilled in several chunks instead of being clamped (the queries of
        chunk c attend all previously written rows [0, offset) plus the
        causal prefix of their own chunk). Uses the einsum attention path
        (the flash kernel requires a static position-0 start)."""
        key = ("chunk", bucket)
        if key not in self._prefill:
            cfg = self.cfg

            @partial(jax.jit, static_argnames=("slot",), donate_argnums=(1,))
            def prefill_chunk(params, caches, ids, length, offset, key,
                              slot: int):
                sl = jax.tree_util.tree_map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1),
                    caches)
                t = ids.shape[1]
                s = (sl["k_codes"].shape[3] if "k_codes" in sl
                     else sl["k"].shape[2])
                qpos = offset + jnp.arange(t)[:, None]
                kpos = jnp.arange(s)[None, :]
                neg = jnp.finfo(jnp.float32).min
                mask = jnp.where((kpos <= qpos) & (kpos < offset + length),
                                 0.0, neg)
                logits, sl = llama.forward(
                    params, ids, cfg, caches=sl, cache_pos=offset,
                    mask=mask[None, None])
                caches = jax.tree_util.tree_map(
                    lambda c, s: jax.lax.dynamic_update_slice_in_dim(
                        c, s.astype(c.dtype), slot, axis=1), caches, sl)
                last = self._pick(logits[0:1, length - 1], key)[0]
                return caches, last.astype(jnp.int32)

            self._prefill[key] = prefill_chunk
        return self._prefill[key]

    # ---- host-side scheduling (C++ scheduler + pipelined dispatch) ----

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 64,
               eos_token_id: Optional[int] = None) -> Request:
        req = Request(self._uid, np.asarray(prompt, np.int32), max_new_tokens,
                      eos_token_id, t_submit=time.monotonic())
        self._uid += 1
        self._reqs[req.uid] = req
        # Prompts longer than the largest bucket are prefilled in chunks
        # (see _admit); only prompts that cannot fit the cache at all keep
        # the LAST max_len-1 tokens (the recent tail that conditions
        # generation), never the head.
        plen = min(len(req.prompt), self.ecfg.max_len - 1)
        self._sched.submit(req.uid, plen,
                           max_new_tokens,
                           -1 if eos_token_id is None else eos_token_id)
        return req

    def stats(self) -> dict:
        """Serving observability over all requests seen by this engine:
        TTFT (submit -> first token observed) and end-to-end latency
        percentiles, plus aggregate generated-token throughput. Host-clock
        based; with the pipelined loop, token observation lags device
        completion by up to one chunk."""
        fin = [r for r in self._reqs.values()
               if r.done and r.t_first and r.t_done]
        out = {"requests_submitted": len(self._reqs),
               "requests_finished": len(fin),
               "tokens_generated": sum(len(r.generated)
                                       for r in self._reqs.values())}
        if fin:
            ttft = np.array([r.t_first - r.t_submit for r in fin])
            e2e = np.array([r.t_done - r.t_submit for r in fin])
            span = (max(r.t_done for r in fin)
                    - min(r.t_submit for r in fin)) or 1e-9
            out.update(
                ttft_p50_s=float(np.percentile(ttft, 50)),
                ttft_p95_s=float(np.percentile(ttft, 95)),
                e2e_p50_s=float(np.percentile(e2e, 50)),
                e2e_p95_s=float(np.percentile(e2e, 95)),
                tokens_per_sec=sum(len(r.generated) for r in fin) / span)
        st = self._spec_stats
        if st["rounds"]:
            out.update(
                spec_verify_rounds=st["rounds"],
                spec_dispatches=st["dispatches"],
                # tokens yielded per verify round (1 = no draft accepted;
                # draft_len+1 = full acceptance)
                spec_accept_len_mean=st["accepted"] / st["rounds"],
                spec_tokens_per_dispatch=(st["accepted"]
                                          / max(st["dispatches"], 1)))
        if "accept_ema" in st:
            # acceptance EMA + plain-fallback chunk count from the
            # auto-disable machinery (spec.run_spec_pipelined) — reported
            # even when spec disabled before the first verify round ran
            out["spec_accept_ema"] = float(st["accept_ema"])
            out["spec_plain_chunks"] = int(st.get("plain_chunks", 0))
        return out

    def cancel(self, req: "Request | int") -> bool:
        """Cancel a queued or running request. Running requests free their
        slot immediately; any tokens already in flight for it are discarded
        when their chunk is processed (uid guard). Returns False if the
        request already finished."""
        uid = req.uid if isinstance(req, Request) else int(req)
        slot = self._sched.cancel(uid)
        if slot == -2:
            return False
        if slot >= 0:
            self._pending_first.pop(slot, None)
            if self._slot_uid[slot] == uid:
                self._slot_uid[slot] = None
        r = self._reqs.get(uid)
        if r is not None:
            r.done = True
            if not r.t_done:
                r.t_done = time.monotonic()
        return True

    def _admit(self, finished: list) -> None:
        """Admit queued requests into free slots (device prefill per slot)."""
        for slot, uid, plen in self._sched.admit():
            req = self._reqs[uid]
            bmax = self.ecfg.prefill_buckets[-1]
            tail = req.prompt[-(self.ecfg.max_len - 1):]
            t = len(tail)
            first = None
            for off in range(0, t, bmax):
                ts = len(tail[off:off + bmax])
                bucket = next((bkt for bkt in self.ecfg.prefill_buckets
                               if bkt >= ts), bmax)
                # the padded window must fit the cache — dynamic_update_slice
                # silently CLAMPS an overrunning start index, corrupting
                # earlier rows. Shift the window left instead (the overlap
                # rows recompute byte-identical KV from the same tokens and
                # positions).
                w = min(off, self.ecfg.max_len - bucket)
                sub = tail[w:w + bucket]
                ts = len(sub)
                ids = np.zeros((1, bucket), np.int32)
                ids[0, :ts] = sub
                pkey = jax.random.fold_in(self._key_prefill, uid)
                if w == 0:
                    prefill = self._get_prefill(bucket)
                    self.caches, first = prefill(self.params, self.caches,
                                                 jnp.array(ids), ts, pkey,
                                                 slot)
                else:
                    prefill = self._get_prefill_chunk(bucket)
                    self.caches, first = prefill(
                        self.params, self.caches, jnp.array(ids),
                        jnp.int32(ts), jnp.int32(w), pkey, slot)
                # jax's CPU runtime exhibits a rare async race when a cache
                # buffer donated to one computation is immediately re-donated
                # to the next with no host sync (~30% of runs read the
                # pre-write cache; isolated by removing donate_argnums — the
                # TPU runtime's donated decode->decode chains never showed
                # this in rounds 1-2). Sync EACH prefill call on CPU: the
                # chunk->chunk and prefill->decode donation chains are both
                # the racy pattern. Keep the overlap on TPU where it pays.
                # A distilled repro attempt lives in
                # tools/repro_cpu_donation_race.py — it does NOT fail in
                # isolation (500x4 trials), so the trigger needs something
                # only the full engine adds; run/extend it before touching
                # this workaround.
                if jax.default_backend() == "cpu":
                    first.block_until_ready()
            # DEFERRED first-token fetch: the prefill result stays on device
            # and chains into the next decode chunk via the patched host_toks
            # vector (_dispatch); the host fetches it in _flush_pending_first
            # AFTER the chunk is dispatched, so the prefill->host RTT
            # overlaps the chunk's device time instead of stalling the
            # pipeline once per admission.
            self._pending_first[slot] = first
            req.generated = []
            self._slot_uid[slot] = uid
            self._pos[slot] = t
            self._admit_gen[slot] += 1

    def _active_mask(self) -> np.ndarray:
        return np.array([u is not None for u in self._slot_uid])

    def _dispatch(self, horizon: int):
        """Launch one decode chunk (no fetch). Chains input tokens on-device
        from the in-flight chunk where valid; host tokens elsewhere."""
        active = self._active_mask()
        if not active.any():
            return None
        b = self.ecfg.num_slots
        if self._inflight is not None:
            fl = self._inflight
            chained = fl["toks"][-1]
            use_chain = (fl["active"] & active
                         & (fl["gen"] == self._admit_gen))
        else:
            chained = jnp.zeros((b,), jnp.int32)
            use_chain = np.zeros(b, bool)
        # NOTE: jnp.asarray can alias host numpy buffers (zero-copy), and the
        # host mutates _pos/_last_tok right after this async dispatch — pass
        # copies or the in-flight chunk races with host bookkeeping.
        key = jax.random.fold_in(self._key_decode, self._chunk_no)
        self._chunk_no += 1
        host_toks = jnp.array(self._last_tok)
        for s, fd in self._pending_first.items():
            if self._slot_uid[s] is not None:
                host_toks = host_toks.at[s].set(fd)   # device, no fetch
        toks, self.caches = self._decode(
            self.params, self.caches, chained,
            host_toks, jnp.array(use_chain),
            jnp.array(self._pos), jnp.array(active), key, horizon=horizon)
        if jax.default_backend() == "cpu":
            # jax's CPU runtime intermittently mis-orders donated-buffer
            # chains under async dispatch (see the note in _admit);
            # serialize on CPU — the TPU runtime keeps the pipelining.
            jax.block_until_ready(toks)
        snap = dict(toks=toks, active=active, gen=self._admit_gen.copy(),
                    uids=list(self._slot_uid), horizon=horizon)
        self._pos[active] += horizon
        return snap

    def _flush_pending_first(self, finished: list) -> None:
        """Fetch deferred prefill first-tokens and run their bookkeeping
        (must happen BEFORE the chunk tokens of the same slots are
        processed; the fetch overlaps the chunk's device compute)."""
        for s in list(self._pending_first):
            fd = self._pending_first.pop(s)
            uid = self._slot_uid[s]
            if uid is None:
                continue
            first = int(fd)
            req = self._reqs[uid]
            req.generated.append(first)
            if self._stream_buf is not None:
                self._stream_buf.append((req, first))
            if not req.t_first:
                req.t_first = time.monotonic()
            self._last_tok[s] = first
            if self._sched.on_token(s, first):
                req.done = True
                req.t_done = req.t_first
                finished.append(req)
                self._slot_uid[s] = None

    def _process_inflight(self) -> list[Request]:
        """Fetch the in-flight chunk's tokens and run retire/admit
        bookkeeping through the scheduler."""
        fl = self._inflight
        self._inflight = None
        finished: list[Request] = []
        self._flush_pending_first(finished)
        toks = np.asarray(fl["toks"])           # [horizon, B]; blocks
        now = time.monotonic()
        retired = set()
        for i in range(fl["horizon"]):
            for s in np.where(fl["active"])[0]:
                uid = fl["uids"][s]
                if s in retired or uid is None or self._slot_uid[s] != uid:
                    continue
                tok = int(toks[i, s])
                req = self._reqs[uid]
                req.generated.append(tok)
                if self._stream_buf is not None:
                    self._stream_buf.append((req, tok))
                if not req.t_first:
                    req.t_first = now
                self._last_tok[s] = tok
                if self._sched.on_token(s, tok):
                    req.done = True
                    req.t_done = now
                    finished.append(req)
                    self._slot_uid[s] = None
                    retired.add(s)
        self._admit(finished)
        return finished

    def step(self) -> list[Request]:
        """Admit waiting requests, run one decode step, retire finished ones.
        Synchronous (no pipelining); returns requests completed this step."""
        finished: list[Request] = []
        if self._inflight is not None:
            finished.extend(self._process_inflight())
        self._admit(finished)
        fl = self._dispatch(horizon=1)
        if fl is not None:
            self._inflight = fl
            finished.extend(self._process_inflight())
        return finished

    def run(self) -> list[Request]:
        """Drain queue + slots to completion with the pipelined loop: chunk
        k+1 is dispatched before chunk k's tokens are fetched."""
        done: list[Request] = []
        for req, _ in self.stream(_finished=done):
            pass
        return done

    def stream(self, _finished: list | None = None):
        """Generator over (request, token) pairs as the pipelined loop
        observes them — the incremental-delivery form of run() (which is
        implemented on top of this, so there is exactly one drain loop).
        Tokens of one request arrive in order; tokens of different requests
        interleave by chunk. The request's ``done`` flag is set by the time
        its last token is yielded."""
        prev = self._stream_buf
        self._stream_buf = buf = []
        fin = _finished if _finished is not None else []
        try:
            h = max(1, self.ecfg.horizon)
            self._admit(fin)
            while (self._inflight is not None or self._active_mask().any()
                   or self._sched.pending > 0):
                nxt = self._dispatch(h)
                if self._inflight is not None:
                    fin.extend(self._process_inflight())
                elif nxt is None:
                    self._admit(fin)
                self._inflight = nxt
                while buf:
                    yield buf.pop(0)
        finally:
            # restore only if this generator still owns the buffer (an
            # abandoned generator must not clobber a newer stream())
            if self._stream_buf is buf:
                self._stream_buf = prev


def _forward_multipos(params, tokens, cfg, caches, positions):
    """Decode forward where every slot writes its KV at its OWN position.

    lax.dynamic_update_slice needs a common offset, so per-slot writes use a
    one-hot scatter along the sequence axis instead. ``tokens`` may be
    [B, 1] (decode) or [B, T] (speculative verify: token t of slot b lands
    at row positions[b] + t and its query attends rows <= positions[b] + t),
    on both the bf16 and int8-KV cache paths.
    """
    b, tt = tokens.shape
    x = params["embed_tokens"][tokens]
    posmat = positions[:, None] + jnp.arange(tt, dtype=positions.dtype)
    cos, sin = llama.rope_tables(cfg, posmat.astype(jnp.float32))
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    quant = "k_codes" in caches
    s = caches["k_codes"].shape[3] if quant else caches["k"].shape[2]
    kpos = jnp.arange(s)[None, None, :]
    mask = jnp.where(kpos <= posmat[:, :, None], 0.0,
                     jnp.finfo(jnp.float32).min)[:, None, :, :]

    from mxq_tpu.packfmt import PackedMXQLinear
    layer_params = params["layers"]
    packed_names = [k for k, v in layer_params.items()
                    if isinstance(v, PackedMXQLinear)]
    dense_stacks = {k: v for k, v in layer_params.items()
                    if k not in packed_names}

    def body(carry, inputs):
        # the FULL [L, ...] cache rides the scan CARRY with per-layer indexed
        # writes — routing it through scan xs/ys copies the entire cache
        # every layer (round-1 device trace: ~3.3 ms/step at S=256; engine
        # r2 measured ~8 ms/step of unexplained time at S=512 from the same
        # pattern before this change)
        x, cache = carry
        idx, dense_sl = inputs
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
            # head-major int8 cache: codes [L, B, H, S, D], scales
            # [L, B, H, S]. Each slot's new token(s) land at their OWN
            # positions in the CURRENT layer via indexed scatters (writes
            # B*T rows of the full stacked buffer, no cache copies). T > 1
            # (speculative verify) attends one query at a time through the
            # same fused kernel — T full-cache reads replace the T
            # sequential decode steps' reads, so total traffic is unchanged.
            kc, ks = kvcache.quantize_kv_headmajor(k)   # [B,H,T,D], [B,H,T]
            vc, vs = kvcache.quantize_kv_headmajor(v)
            rows = jnp.arange(b_)[:, None]
            from mxq_tpu.ops import attn_int8 as _a8

            if t == 1:
                # FUSED WRITE (decode): the kernel reads layer ``idx``
                # straight out of the folded stacked cache (no layer-view
                # copy) and commits the current token's code rows in-kernel
                # at each slot's own position via aliased outputs; only the
                # scale rows ride out of the scan as a pending output and
                # commit in one stacked scatter after the scan (the
                # per-layer view/update chain this replaces cost ~1.1 ms of
                # the 8.9 ms 7B step — docs/RESULTS.md r4 trace).
                ctx, cache, pend = _a8.decode_attend_update(
                    cache, q[:, 0], kc, ks, vc, vs, idx, positions)
                ctx = ctx[:, None]
            else:
                def scat(buf, val):
                    # buf [L, B, H, S, ...]; advanced indices (idx, rows,
                    # posmat) with the H slice between put ALL T rows at once
                    # at (idx, rows[b], :, posmat[b, t]) — one stacked
                    # scatter per buffer, matching the bf16 branch
                    return buf.at[idx, rows, :, posmat].set(
                        jnp.moveaxis(val, 2, 1).astype(buf.dtype))

                cache = {
                    "k_codes": scat(cache["k_codes"], kc),
                    "k_scale": scat(cache["k_scale"], ks),
                    "v_codes": scat(cache["v_codes"], vc),
                    "v_scale": scat(cache["v_scale"], vs),
                }
                layer_view = {kk: jax.lax.dynamic_index_in_dim(
                    cache[kk], idx, 0, keepdims=False)
                    for kk in ("k_codes", "k_scale", "v_codes", "v_scale")}
                # fused decode attention straight off the int8 codes
                ctx = jnp.stack([
                    _a8.int8_decode_attention(
                        q[:, ti], layer_view["k_codes"],
                        layer_view["k_scale"], layer_view["v_codes"],
                        layer_view["v_scale"], positions + ti)
                    for ti in range(t)], axis=1)
                pend = None
            ctx = ctx.reshape(b_, t, nh * d).astype(x.dtype)
        else:
            pend = None

            def scatter(buf, val):
                # buf [L, B, S, H, D], val [B, T, H, D]: row posmat[b, t]
                # of slot b <- val[b, t] (rows within one call are distinct)
                return buf.at[idx, jnp.arange(b_)[:, None], posmat].set(
                    val.astype(buf.dtype))

            cache = {"k": scatter(cache["k"], k),
                     "v": scatter(cache["v"], v)}
            kk = jax.lax.dynamic_index_in_dim(cache["k"], idx, 0,
                                              keepdims=False)
            vv = jax.lax.dynamic_index_in_dim(cache["v"], idx, 0,
                                              keepdims=False)
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
        return (x, cache), pend

    nl = cfg.num_hidden_layers
    (x, new_caches), pend = jax.lax.scan(
        body, (x, caches), (jnp.arange(nl, dtype=jnp.int32), dense_stacks))
    if pend is not None:
        # commit all layers' pending one-token rows in ONE scatter per
        # buffer: buf[:, rows, :, posmat] has advanced dims [B, 1] first.
        # Fused-write (len 2): only SCALE rows (codes were written
        # in-kernel); r3 deferred-write (len 4): codes too.
        rows = jnp.arange(b)[:, None]

        def commits(buf, val):                      # val [L,B,H,1]
            return buf.at[:, rows, :, posmat].set(
                val.transpose(1, 3, 0, 2).astype(buf.dtype))

        def commitc(buf, val):                      # val [L,B,H,1,D]
            return buf.at[:, rows, :, posmat].set(
                val.transpose(1, 3, 0, 2, 4).astype(buf.dtype))

        if len(pend) == 2:
            ks, vs = pend
            new_caches = {**new_caches,
                          "k_scale": commits(new_caches["k_scale"], ks),
                          "v_scale": commits(new_caches["v_scale"], vs)}
        else:
            kc, ks, vc, vs = pend
            new_caches = {
                "k_codes": commitc(new_caches["k_codes"], kc),
                "k_scale": commits(new_caches["k_scale"], ks),
                "v_codes": commitc(new_caches["v_codes"], vc),
                "v_scale": commits(new_caches["v_scale"], vs)}
    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        logits = x @ params["embed_tokens"].T
    elif type(head).__name__ == "PackedU4Linear":
        # packed uniform-4b lm_head (EngineConfig.lm_head_bits=4)
        from mxq_tpu.ops import uniform4
        logits = uniform4.u4_matmul(x, head)
    else:
        logits = x @ head
    return logits.astype(jnp.float32), new_caches
