"""Prompt-lookup speculative decoding — lossless greedy acceleration.

No draft model: draft tokens are copied from the most recent earlier
occurrence of the sequence's own trailing n-gram (prompt + generated so
far), then verified in ONE multi-token device step. Greedy outputs are
IDENTICAL to plain decode — a draft only changes how many tokens one
dispatch yields (1 + longest matching prefix), never their values.

Verification uses engine._forward_multipos with T = draft+1: input t of
slot b writes its KV at row positions[b] + t and attends rows <= that, so
the logits at input t are exactly what sequential decode would produce IF
inputs 0..t were the true continuation. Rows written for rejected inputs
sit above the accepted frontier: they are invisible to later queries (the
causal position mask) and are overwritten before the frontier reaches them
(the next dispatch rewrites rows pos'..pos'+T-1 with pos' <= every junk
row).

The reference has no serving loop at all (SURVEY.md §0.3); this extends the
beyond-reference engine. Works with bf16 AND int8 KV caches (the fused
int8-KV attention kernel attends one verify query at a time — T full-cache
reads replace the T sequential decode steps' reads).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.serving import engine as eng


def ngram_draft(hist: np.ndarray, ngram: int, draft_len: int) -> np.ndarray:
    """Draft ``draft_len`` tokens by prompt-lookup: find the most recent
    earlier occurrence of the trailing ``ngram`` tokens and copy what
    followed it. Falls back to repeating the last token (still verified —
    worst case one token per dispatch, never a wrong one)."""
    h = np.asarray(hist, np.int32)
    n = min(ngram, len(h) - 1) if len(h) > 1 else 0
    if n > 0:
        key = h[-n:]
        # sliding windows over h[:-1]; rightmost match wins
        windows = np.lib.stride_tricks.sliding_window_view(h[:-1], n)
        hits = np.nonzero((windows == key).all(axis=1))[0]
        # a hit at index i means h[i:i+n] == key; continuation starts i+n
        for i in hits[::-1]:
            start = i + n
            if start >= len(h):
                continue
            cont = h[start:start + draft_len]
            if len(cont):
                out = np.full(draft_len, h[-1], np.int32)
                out[: len(cont)] = cont
                return out
    return np.full(draft_len, h[-1], np.int32)


def _get_verify(engine: "eng.Engine", t: int):
    key = ("spec_verify", t)
    cache = engine._prefill  # reuse the engine's compiled-program registry
    if key not in cache:
        cfg = engine.cfg

        @partial(jax.jit, donate_argnums=(1,))
        def verify(params, caches, toks, positions, active):
            logits, caches = eng._forward_multipos(params, toks, cfg, caches,
                                                   positions)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
            preds = jnp.where(active[:, None], preds, 0)
            return preds, caches

        cache[key] = verify
    return cache[key]


# ---- device-side drafting + chained verification (pipelined path) ----
#
# The synchronous loop below pays one host round-trip per verify — through a
# relayed TPU (~25 ms RTT) that forfeits most of the speedup. The pipelined
# path moves BOTH the draft and the accept logic on device: a jitted chunk
# runs `rounds` draft->verify->accept iterations under lax.scan against a
# device-resident recent-history window, and the host chains chunk k+1
# before fetching chunk k (the engine._dispatch pattern). Greedy outputs
# remain exactly those of plain decode — drafts only change how many tokens
# a round yields.

HIST_WINDOW = 128   # device-resident history (tokens) the drafter can match


def _device_ngram_draft(hist, hist_len, last_tok, ngram: int, d: int):
    """Vectorized prompt-lookup over the [B, H] history window (most recent
    token at column H-1; left-padded). Returns drafts [B, d]. Semantics
    mirror ngram_draft() restricted to the last H tokens: rightmost earlier
    occurrence of the trailing n-gram wins; fallback repeats the last
    token."""
    b, h = hist.shape
    n = ngram
    w = h - n                                    # candidate window starts
    key = hist[:, h - n:]                        # [B, n] trailing n-gram
    idx = jnp.arange(w)[:, None] + jnp.arange(n)[None, :]
    hist_w = hist[:, idx]                        # [B, W, n]
    starts = jnp.arange(w)[None, :]
    in_hist = starts >= (h - hist_len[:, None])  # window fully in real tokens
    match = (hist_w == key[:, None, :]).all(-1) & in_hist \
        & (hist_len >= n + 1)[:, None]
    i_best = jnp.max(jnp.where(match, starts, -1), axis=1)   # [B]
    found = i_best >= 0
    cont = i_best[:, None] + n + jnp.arange(d)[None, :]      # [B, d]
    ok = found[:, None] & (cont <= h - 1)
    toks = jnp.take_along_axis(hist, jnp.clip(cont, 0, h - 1), axis=1)
    return jnp.where(ok, toks, last_tok[:, None]).astype(jnp.int32)


def _accept_count(toks, preds, act):
    """[B] tokens yielded by one verify round: 1 + the number of leading
    draft positions whose draft token equals the verified prediction
    (toks[:, 1:] are the drafts, preds[:, :-1] the predictions they must
    match); 0 for slots sitting the round out."""
    ok = (toks[:, 1:] == preds[:, :-1]).astype(jnp.int32)
    return jnp.where(act, 1 + jnp.sum(jnp.cumprod(ok, axis=1), axis=1), 0)


def _hist_append(hist, hist_len, preds, n_acc):
    """Append the first n_acc[b] tokens of preds[b] to each slot's history
    shift-register. ext = [hist | preds]; new window = ext[n_acc : n_acc+H]
    — indices >= H + n_acc (the rejected tail) are never selected."""
    b, h = hist.shape
    ext = jnp.concatenate([hist, preds], axis=1)
    idx = n_acc[:, None] + jnp.arange(h)[None, :]
    return (jnp.take_along_axis(ext, idx, axis=1),
            jnp.minimum(hist_len + n_acc, h))


def _get_spec_chunk(engine: "eng.Engine", d: int, rounds: int, ngram: int):
    key = ("spec_chunk", d, rounds, ngram)
    cache = engine._prefill
    if key not in cache:
        cfg = engine.cfg
        max_len = engine.ecfg.max_len

        @partial(jax.jit, donate_argnums=(1,))
        def spec_chunk(params, caches, hist, hist_len, pos, last_tok,
                       active):
            def round_fn(carry, _):
                caches, hist, hist_len, pos, last_tok = carry
                # belt-and-suspenders: slots whose writes could run past the
                # cache sit this chunk out (the host also bounds the chain)
                act = active & (pos + d + 1 <= max_len - 1)
                drafts = _device_ngram_draft(hist, hist_len, last_tok,
                                             ngram, d)
                toks = jnp.concatenate([last_tok[:, None], drafts], axis=1)
                logits, caches2 = eng._forward_multipos(
                    params, toks, cfg, caches, jnp.where(act, pos, 0))
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                preds = jnp.where(act[:, None], preds, 0)
                # accept draft i while every earlier draft matched its
                # verified prediction (junk rows land above the frontier
                # and are invisible/overwritten, as in run_spec)
                n_acc = _accept_count(toks, preds, act)       # [B]
                last = jnp.take_along_axis(
                    preds, jnp.maximum(n_acc - 1, 0)[:, None], axis=1)[:, 0]
                last_tok = jnp.where(act, last, last_tok)
                hist, hist_len = _hist_append(hist, hist_len, preds, n_acc)
                pos = pos + n_acc
                return (caches2, hist, hist_len, pos, last_tok), \
                    (preds, n_acc)

            (caches, hist, hist_len, pos, last_tok), (toks_out, nacc_out) = \
                jax.lax.scan(round_fn,
                             (caches, hist, hist_len, pos, last_tok),
                             None, length=rounds)
            return caches, hist, hist_len, pos, last_tok, toks_out, nacc_out

        cache[key] = spec_chunk
    return cache[key]


def _build_hist(engine: "eng.Engine", h: int):
    """Host-side (re)build of the device history window from request
    state."""
    b = engine.ecfg.num_slots
    hist = np.zeros((b, h), np.int32)
    hist_len = np.zeros((b,), np.int32)
    for s in range(b):
        uid = engine._slot_uid[s]
        if uid is None:
            continue
        req = engine._reqs[uid]
        full = np.concatenate([np.asarray(req.prompt, np.int32),
                               np.asarray(req.generated, np.int32)])
        tail = full[-h:]
        hist[s, h - len(tail):] = tail
        hist_len[s] = len(tail)
    return hist, hist_len


def run_spec_pipelined(engine: "eng.Engine", draft_len: int = 4,
                       ngram: int = 3, rounds: int = 4,
                       auto_disable: bool = True,
                       min_accept: "float | None" = None,
                       probe_every: int = 16) -> list:
    """Drain the engine's queue with pipelined speculative greedy decoding:
    drafting + acceptance run on device (`rounds` verify rounds per
    dispatch) and chunk k+1 is dispatched before chunk k's tokens are
    fetched, so the host RTT and bookkeeping overlap device compute.
    Outputs match engine.run() greedy exactly in exact arithmetic (CPU
    f32 tests); on TPU, the T-token verify batches a different matmul
    shape than 1-token decode, so default-precision bf16 MXU rounding can
    flip argmax near-ties — measured 4/384 tokens on random-INIT weights
    whose logit gaps are ~0, and 0/384 on a workload with real gaps
    (docs/RESULTS.md r3 A/B). Acceptance statistics accumulate on the
    engine (see Engine.stats: spec_*).

    AUTO-DISABLE: speculative decoding LOSES on workloads where
    prompt-lookup drafts miss (r3 A/B: 0.88x on random prompts at accept
    4.6/5 vs 1.07x repetitive at 4.9-5.0) — so an EMA of tokens accepted
    per verify round is tracked, and when it drops below ``min_accept``
    (default 0.95*(d+1), between the measured winning and losing bands)
    the loop falls back to the engine's PLAIN pipelined chunks, re-probing
    with one spec chunk every ``probe_every`` plain chunks in case the
    workload turned repetitive. ``auto_disable=False`` restores the
    always-spec behavior; ``min_accept`` overrides the breakeven."""
    assert engine.ecfg.greedy, "speculative decoding is greedy-only"
    assert engine._inflight is None, \
        "drain the pipelined decode loop before speculative decoding"
    done: list = []
    b = engine.ecfg.num_slots
    max_len = engine.ecfg.max_len
    d = draft_len
    worst = rounds * (d + 1)
    if min_accept is None:
        min_accept = 0.95 * (d + 1)
    ema_decay = 0.7
    spec_on = True
    plain_since = 0
    engine._spec_stats.setdefault("plain_chunks", 0)
    engine._spec_stats.setdefault("accept_ema", float(d + 1))
    engine._admit(done)
    engine._flush_pending_first(done)

    def process(snap) -> bool:
        """Fetch one chunk's outputs; returns True if any slot retired."""
        toks = np.asarray(snap["toks"])          # [rounds, B, d+1]
        nacc = np.asarray(snap["nacc"])          # [rounds, B]
        now = time.monotonic()
        retired = False
        st = engine._spec_stats
        st["dispatches"] += 1
        live = nacc[nacc > 0]
        if live.size:
            st["accept_ema"] = (ema_decay * st["accept_ema"]
                                + (1 - ema_decay) * float(live.mean()))
        for r in range(toks.shape[0]):
            for s in range(b):
                uid = snap["uids"][s]
                n = int(nacc[r, s])
                if uid is None or engine._slot_uid[s] != uid or n == 0:
                    continue
                st["rounds"] += 1
                st["accepted"] += n
                req = engine._reqs[uid]
                for i in range(n):
                    tok = int(toks[r, s, i])
                    req.generated.append(tok)
                    if not req.t_first:
                        req.t_first = now
                    engine._last_tok[s] = tok
                    engine._pos[s] += 1
                    if engine._sched.on_token(s, tok):
                        req.done = True
                        req.t_done = now
                        done.append(req)
                        engine._slot_uid[s] = None
                        retired = True
                        break
        return retired

    state = None       # device-chained (hist, hist_len, pos, last_tok)
    state_uids = None  # slot occupancy the chained state was built for
    inflight = None
    pos_bound = None   # worst-case device pos while chunks are in flight
    while engine._active_mask().any() or engine._sched.pending > 0 \
            or inflight is not None or engine._inflight is not None:
        st = engine._spec_stats
        if auto_disable and spec_on and st["accept_ema"] < min_accept:
            spec_on = False
            plain_since = 0
        if not spec_on:
            # PLAIN fallback: drain any spec chunk in flight, then run the
            # engine's own pipelined decode chunks (stream()'s dispatch
            # pattern) until the next re-probe.
            if inflight is not None:
                process(inflight)
                inflight = None
                state = None
                engine._admit(done)
                engine._flush_pending_first(done)
            if plain_since >= probe_every:
                # re-probe: drain the plain pipeline, neutralize the EMA
                # (one good probe keeps spec on; one bad one re-disables)
                if engine._inflight is not None:
                    done.extend(engine._process_inflight())
                # settle deferred prefill first-tokens BEFORE spec rebuilds
                # hist/_last_tok from host truth
                engine._flush_pending_first(done)
                spec_on = True
                st["accept_ema"] = float(min_accept)
                plain_since = 0
                state = None
                continue
            h = max(1, engine.ecfg.horizon)
            nxt = engine._dispatch(h)
            if engine._inflight is not None:
                done.extend(engine._process_inflight())
            elif nxt is None:
                engine._admit(done)
                engine._flush_pending_first(done)
            engine._inflight = nxt
            if nxt is not None:
                st["plain_chunks"] += 1
            plain_since += 1
            continue
        if engine._inflight is not None:
            # returning from the plain fallback: settle its last chunk
            # (and any deferred first-tokens its _admit produced) before
            # speculative dispatches resume
            done.extend(engine._process_inflight())
            engine._flush_pending_first(done)
            state = None
            continue
        active = engine._active_mask()
        can_chain = (active.any() and state is not None
                     and state_uids == list(engine._slot_uid)
                     and all(pos_bound[s] + worst <= max_len - 1
                             for s in np.where(active)[0]))
        if can_chain:
            spec_chunk = _get_spec_chunk(engine, d, rounds, ngram)
            caches, hist, hlen, pos_d, last_d, toks, nacc = spec_chunk(
                engine.params, engine.caches, *state,
                jnp.asarray(active))
            engine.caches = caches
            if jax.default_backend() == "cpu":
                jax.block_until_ready(toks)   # same CPU-runtime note as
                                              # engine._dispatch
            snap = dict(toks=toks, nacc=nacc,
                        uids=list(engine._slot_uid))
            for s in np.where(active)[0]:
                pos_bound[s] += worst
            state = (hist, hlen, pos_d, last_d)
            if inflight is not None:
                if process(inflight):
                    # retirement invalidates the chained state: drain the
                    # new chunk too and rebuild from host truth
                    process(snap)
                    snap = None
                    state = None
            inflight = snap
            # admissions change slot occupancy -> state_uids mismatch next
            # iteration forces a drain + rebuild (a new slot's device-side
            # hist/pos would be stale)
            engine._admit(done)
            engine._flush_pending_first(done)
            continue
        # resync path: drain in-flight work, rebuild device state
        if inflight is not None:
            process(inflight)
            inflight = None
            state = None
            engine._admit(done)
            engine._flush_pending_first(done)
            continue
        if not active.any():
            engine._admit(done)
            engine._flush_pending_first(done)
            if not engine._active_mask().any() \
                    and engine._sched.pending == 0:
                break
            continue
        room = int(min(max_len - 1 - engine._pos[s]
                       for s in np.where(active)[0]))
        if room < worst + 1:
            # near the cache end: the synchronous loop shrinks d_eff to fit
            done.extend(run_spec(engine, draft_len=d, ngram=ngram))
            state = None
            continue
        hist, hist_len = _build_hist(engine, HIST_WINDOW)
        state = (jnp.asarray(hist), jnp.asarray(hist_len),
                 jnp.asarray(engine._pos.astype(np.int32)),
                 jnp.asarray(engine._last_tok.astype(np.int32)))
        state_uids = list(engine._slot_uid)
        pos_bound = engine._pos.astype(int).copy()
    return done


def run_spec(engine: "eng.Engine", draft_len: int = 4,
             ngram: int = 3) -> list:
    """Drain the engine's queue with prompt-lookup speculative GREEDY
    decoding. Returns finished requests; generations match engine.run()
    greedy exactly (tested). Synchronous dispatch (one verify round-trip
    per step) — run_spec_pipelined is the fast path; this remains the
    simple oracle and the near-cache-end fallback."""
    assert engine.ecfg.greedy, "speculative decoding is greedy-only"
    assert engine._inflight is None, \
        "drain the pipelined loop (process its in-flight chunk) before " \
        "switching to speculative decoding — _pos already advanced for it"
    done: list = []
    engine._admit(done)
    engine._flush_pending_first(done)
    b = engine.ecfg.num_slots
    max_len = engine.ecfg.max_len
    while engine._active_mask().any() or engine._sched.pending > 0:
        active = engine._active_mask()
        if not active.any():
            engine._admit(done)
            engine._flush_pending_first(done)
            continue
        act_idx = np.where(active)[0]
        # one global draft length per dispatch, shrunk so no slot's writes
        # can run past the last cache row (bounded compile count: <= D+1)
        room = int(min(max_len - 1 - engine._pos[s] for s in act_idx))
        d_eff = max(0, min(draft_len, room - 1))
        drafts = np.zeros((b, d_eff), np.int32)
        for s in act_idx:
            req = engine._reqs[engine._slot_uid[s]]
            hist = np.concatenate([req.prompt[-(max_len - 1):],
                                   np.asarray(req.generated, np.int32)])
            if d_eff:
                drafts[s] = ngram_draft(hist, ngram, d_eff)
        toks = np.concatenate([engine._last_tok[:, None], drafts], axis=1)
        verify = _get_verify(engine, d_eff + 1)
        preds, engine.caches = verify(
            engine.params, engine.caches, jnp.array(toks),
            jnp.array(np.where(active, engine._pos, 0).astype(np.int32)),
            jnp.array(active))
        preds = np.asarray(preds)                      # [B, d_eff+1]
        now = time.monotonic()
        engine._spec_stats["dispatches"] += 1
        for s in act_idx:
            uid = engine._slot_uid[s]
            req = engine._reqs[uid]
            consumed = 0
            for i in range(d_eff + 1):
                tok = int(preds[s, i])
                req.generated.append(tok)
                if not req.t_first:
                    req.t_first = now
                consumed += 1
                engine._last_tok[s] = tok
                finished = engine._sched.on_token(s, tok)
                if finished:
                    req.done = True
                    req.t_done = now
                    done.append(req)
                    engine._slot_uid[s] = None
                    break
                # accept the next draft only if it matches this prediction
                if i < d_eff and int(toks[s, i + 1]) != tok:
                    break
            engine._pos[s] += consumed
            engine._spec_stats["rounds"] += 1
            engine._spec_stats["accepted"] += consumed
        engine._admit(done)
        engine._flush_pending_first(done)
    return done
