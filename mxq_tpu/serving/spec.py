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


def run_spec(engine: "eng.Engine", draft_len: int = 4,
             ngram: int = 3) -> list:
    """Drain the engine's queue with prompt-lookup speculative GREEDY
    decoding. Returns finished requests; generations match engine.run()
    greedy exactly (tested). Synchronous dispatch (one verify round-trip
    per step); combine with pipelining later if profitable."""
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
        import time
        now = time.monotonic()
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
        engine._admit(done)
        engine._flush_pending_first(done)
    return done
