"""Serving engine tests: KV quant roundtrip, continuous batching correctness
(engine generations == plain greedy decode), slot reuse."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.serving import engine as eng, kvcache

CFG = llama.LlamaConfig.tiny()


def greedy_reference(params, cfg, prompt, n_new):
    """Plain full-recompute greedy decode (no cache) — ground truth."""
    ids = jnp.asarray(prompt)[None]
    out = []
    for _ in range(n_new):
        logits, _ = llama.forward(params, ids, cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        ids = jnp.concatenate([ids, jnp.full((1, 1), nxt, ids.dtype)], axis=1)
    return out


class TestKVQuant:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 64))
        c, s = kvcache.quantize_kv(x, 64)
        y = kvcache.dequantize_kv(c, s, 64, jnp.float32)
        err = np.abs(np.asarray(y) - np.asarray(x)).max()
        assert err < np.abs(np.asarray(x)).max() / 100


class TestInt8Attention:
    def test_kernel_matches_reference(self):
        """Fused int8-KV decode attention (pallas, interpret on CPU) vs the
        dequantize-then-attend jnp oracle, incl. GQA + per-row masking."""
        from mxq_tpu.ops import attn_int8
        b, hq, hkv, s, d = 2, 8, 4, 64, 64
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
        kc = jax.random.randint(keys[1], (b, hkv, s, d), -127, 128, jnp.int8)
        vc = jax.random.randint(keys[2], (b, hkv, s, d), -127, 128, jnp.int8)
        ks = (jax.random.uniform(keys[3], (b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        vs = (jax.random.uniform(keys[4], (b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        positions = jnp.array([5, 63], jnp.int32)
        out = attn_int8.int8_decode_attention(q, kc, ks, vc, vs, positions)
        ref = attn_int8.int8_decode_attention_reference(q, kc, ks, vc, vs,
                                                        positions)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)

    def test_mha_no_groups(self):
        from mxq_tpu.ops import attn_int8
        b, h, s, d = 1, 4, 32, 64
        keys = jax.random.split(jax.random.PRNGKey(1), 5)
        q = jax.random.normal(keys[0], (b, h, d), jnp.float32)
        kc = jax.random.randint(keys[1], (b, h, s, d), -127, 128, jnp.int8)
        vc = jax.random.randint(keys[2], (b, h, s, d), -127, 128, jnp.int8)
        ks = jnp.full((b, h, s), 0.01, jnp.bfloat16)
        vs = jnp.full((b, h, s), 0.01, jnp.bfloat16)
        positions = jnp.array([17], jnp.int32)
        out = attn_int8.int8_decode_attention(q, kc, ks, vc, vs, positions)
        ref = attn_int8.int8_decode_attention_reference(q, kc, ks, vc, vs,
                                                        positions)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)

    def test_deferred_write_matches_write_then_attend(self):
        """int8_decode_attention_cur (strict <pos history mask + out-of-cache
        current-token softmax term) must equal splicing the current row into
        the cache at pos and attending with int8_decode_attention — incl. the
        pos=0 edge (no history) and GQA. Pins the deferred-write decode math
        directly (previously only covered end-to-end via the engine)."""
        from mxq_tpu.ops import attn_int8
        b, hq, hkv, s, d = 3, 8, 4, 32, 64
        keys = jax.random.split(jax.random.PRNGKey(7), 7)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
        kc = jax.random.randint(keys[1], (b, hkv, s, d), -127, 128, jnp.int8)
        vc = jax.random.randint(keys[2], (b, hkv, s, d), -127, 128, jnp.int8)
        ks = (jax.random.uniform(keys[3], (b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        vs = (jax.random.uniform(keys[4], (b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        kcur = jax.random.randint(keys[5], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        vcur = jax.random.randint(keys[6], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        kscur = jnp.full((b, hkv, 1), 0.015, jnp.bfloat16)
        vscur = jnp.full((b, hkv, 1), 0.012, jnp.bfloat16)
        # pos=0 (no history), mid, and last-row edge
        positions = jnp.array([0, 11, s - 1], jnp.int32)

        out = attn_int8.int8_decode_attention_cur(
            q, kc, ks, vc, vs, kcur, kscur, vcur, vscur, positions)

        # write-then-attend oracle: splice the current row in at positions[b]
        rows = jnp.arange(b)
        kc2 = kc.at[rows, :, positions].set(kcur[:, :, 0])
        vc2 = vc.at[rows, :, positions].set(vcur[:, :, 0])
        ks2 = ks.at[rows, :, positions].set(kscur[:, :, 0])
        vs2 = vs.at[rows, :, positions].set(vscur[:, :, 0])
        ref = attn_int8.int8_decode_attention(q, kc2, ks2, vc2, vs2,
                                              positions)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)

    def test_fused_write_matches_cur_and_writes_rows(self):
        """int8_decode_attention_fused_write (folded-stack reads + in-kernel
        aliased row writes) must produce the same ctx as
        int8_decode_attention_cur on the layer view, and its returned code
        stacks must equal splicing each slot's current row in at
        positions[b] of layer idx — all other layers untouched."""
        from mxq_tpu.ops import attn_int8
        L, b, hq, hkv, s, d = 3, 3, 8, 4, 32, 64
        keys = jax.random.split(jax.random.PRNGKey(11), 7)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
        kc = jax.random.randint(keys[1], (L, b, hkv, s, d), -127, 128,
                                jnp.int8)
        vc = jax.random.randint(keys[2], (L, b, hkv, s, d), -127, 128,
                                jnp.int8)
        ks = (jax.random.uniform(keys[3], (L, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        vs = (jax.random.uniform(keys[4], (L, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        kcur = jax.random.randint(keys[5], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        vcur = jax.random.randint(keys[6], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        kscur = jnp.full((b, hkv, 1), 0.015, jnp.bfloat16)
        vscur = jnp.full((b, hkv, 1), 0.012, jnp.bfloat16)
        positions = jnp.array([0, 11, s - 1], jnp.int32)
        rows = jnp.arange(b)
        for idx in range(L):
            out, kc2, vc2 = attn_int8.int8_decode_attention_fused_write(
                q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                jnp.int32(idx), positions)
            ref = attn_int8.int8_decode_attention_cur(
                q, kc[idx], ks[idx], vc[idx], vs[idx],
                kcur, kscur, vcur, vscur, positions)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            kc_ref = kc.at[idx, rows, :, positions].set(kcur[:, :, 0])
            vc_ref = vc.at[idx, rows, :, positions].set(vcur[:, :, 0])
            np.testing.assert_array_equal(np.asarray(kc2),
                                          np.asarray(kc_ref))
            np.testing.assert_array_equal(np.asarray(vc2),
                                          np.asarray(vc_ref))


class TestEngine:
    def test_matches_greedy_decode(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(5, dtype=np.int32) + 7
        n_new = 6
        ref = greedy_reference(params, CFG, prompt, n_new)

        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        req = e.submit(prompt, max_new_tokens=n_new)
        done = e.run()
        assert len(done) == 1
        assert req.generated[:n_new] == ref

    def test_kv_quant_engine_close(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(5, dtype=np.int32) + 7
        ref = greedy_reference(params, CFG, prompt, 4)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=True))
        req = e.submit(prompt, max_new_tokens=4)
        e.run()
        # int8 KV: greedy path may diverge eventually; first tokens agree
        assert req.generated[0] == ref[0]

    def test_continuous_batching_multiple_requests(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(1))
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        reqs = [e.submit(np.arange(3, dtype=np.int32) + i, max_new_tokens=3 + i)
                for i in range(5)]
        done = e.run()
        assert len(done) == 5
        for i, r in enumerate(reqs):
            assert r.done and len(r.generated) >= 3 + i
            ref = greedy_reference(params, CFG,
                                   np.arange(3, dtype=np.int32) + i, 3)
            assert r.generated[:3] == ref


class TestQuantCacheDecode:
    def test_int8_stacked_cache_decode_close_to_dense(self):
        """llama.forward with the stacked int8 cache (serving fast path)
        tracks the dense-cache decode closely."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0,
                                 CFG.vocab_size)
        dense = llama.init_cache(CFG, 2, 16, dtype=jnp.float32)
        quant = kvcache.init_quant_cache(
            CFG.num_hidden_layers, 2, 16, CFG.num_key_value_heads,
            CFG.head_dim)
        ld = lq = None
        for i in range(6):
            ld, dense = llama.forward(params, ids[:, i:i+1], CFG,
                                      caches=dense, cache_pos=i)
            lq, quant = llama.forward(params, ids[:, i:i+1], CFG,
                                      caches=quant, cache_pos=i)
        a, b = np.asarray(ld), np.asarray(lq)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.999, corr
        # int8 cache halves+ the bytes
        dense_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree_util.tree_leaves(dense))
        quant_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree_util.tree_leaves(quant))
        assert quant_bytes < dense_bytes / 3  # int8 vs f32 here


def _spec_run(holder, prompt, n_new, draft_len=4, ngram=3, nreq=1,
              pipelined=False):
    from mxq_tpu.serving import spec
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    e = eng.Engine(params, CFG, eng.EngineConfig(
        num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
    reqs = [e.submit(prompt + i, max_new_tokens=n_new)
            for i in range(nreq)]
    if pipelined:
        spec.run_spec_pipelined(e, draft_len=draft_len, ngram=ngram,
                                rounds=2)
    else:
        spec.run_spec(e, draft_len=draft_len, ngram=ngram)
    refs = [greedy_reference(params, CFG, prompt + i, n_new)
            for i in range(nreq)]
    holder.last_engine = e
    return reqs, refs


class TestSpeculative:
    def _run(self, prompt, n_new, draft_len=4, ngram=3, nreq=1):
        return _spec_run(self, prompt, n_new, draft_len, ngram, nreq)

    @pytest.mark.slow
    def test_repetitive_prompt_matches_greedy(self):
        """High-acceptance case: a looping prompt makes prompt-lookup drafts
        accurate, and outputs must STILL match plain greedy exactly."""
        prompt = np.array([5, 6, 7, 8] * 5, np.int32)
        reqs, refs = self._run(prompt, 10)
        assert reqs[0].generated[:10] == refs[0]

    @pytest.mark.slow
    def test_random_prompt_matches_greedy(self):
        """Low-acceptance case (drafts mostly rejected): still exact."""
        rng = np.random.RandomState(3)
        prompt = rng.randint(1, CFG.vocab_size, size=12).astype(np.int32)
        reqs, refs = self._run(prompt, 8)
        assert reqs[0].generated[:8] == refs[0]

    @pytest.mark.slow
    def test_multi_request_slot_reuse(self):
        prompt = np.array([9, 10, 11] * 4, np.int32)
        reqs, refs = self._run(prompt, 6, nreq=5)
        for r, ref in zip(reqs, refs):
            assert r.done and r.generated[:6] == ref

    def test_spec_int8_kv_matches_plain_int8_engine(self):
        """Speculative decoding over the int8 KV cache must equal the plain
        int8-KV engine token-for-token (same fused-attention math, fewer
        dispatches)."""
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array([4, 5, 6] * 5, np.int32)

        e1 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=True))
        r1 = e1.submit(prompt, max_new_tokens=8)
        e1.run()

        e2 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=True))
        r2 = e2.submit(prompt, max_new_tokens=8)
        spec.run_spec(e2, draft_len=4)
        assert r2.generated[:8] == r1.generated[:8]

    @pytest.mark.slow
    def test_spec_with_chunked_prefill_prompt(self):
        """Speculative decoding after a multi-chunk prefill (prompt beyond
        the largest bucket) still matches plain greedy exactly."""
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array(list(range(3, 9)) * 7, np.int32)  # len 42 > 16
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        req = e.submit(prompt, max_new_tokens=8)
        spec.run_spec(e, draft_len=4)
        ref = greedy_reference(params, CFG, prompt, 8)
        assert req.generated[:8] == ref

    def test_ngram_draft_lookup(self):
        from mxq_tpu.serving.spec import ngram_draft
        hist = np.array([1, 2, 3, 9, 1, 2, 3], np.int32)
        # trailing 3-gram [1,2,3] matched earlier; continuation was [9,1,2]
        d = ngram_draft(hist, 3, 3)
        assert list(d) == [9, 1, 2]
        # no match -> repeat last token
        d2 = ngram_draft(np.array([4, 5, 6], np.int32), 3, 2)
        assert list(d2) == [6, 6]


class TestStats:
    def test_stats_populated(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False,
            horizon=2))
        for i in range(3):
            e.submit(np.arange(1, 6, dtype=np.int32) + i, max_new_tokens=4)
        e.run()
        s = e.stats()
        assert s["requests_finished"] == 3
        assert s["tokens_generated"] >= 12
        assert s["ttft_p50_s"] > 0 and s["e2e_p95_s"] >= s["ttft_p50_s"]
        assert s["tokens_per_sec"] > 0


class TestSpeculativePipelined:
    """The pipelined path (device-side drafting + accept, chained chunks)
    must be exactly as lossless as the synchronous oracle."""

    def _run(self, prompt, n_new, draft_len=4, ngram=3, nreq=1,
             pipelined=True):
        return _spec_run(self, prompt, n_new, draft_len, ngram, nreq,
                         pipelined=pipelined)

    def test_repetitive_prompt_exact_and_stats(self):
        prompt = np.array([5, 6, 7, 8] * 5, np.int32)
        reqs, refs = self._run(prompt, 10, pipelined=True)
        assert reqs[0].generated[:10] == refs[0]
        s = self.last_engine.stats()
        # the random-init tiny model's continuation is not actually
        # repetitive, so acceptance ~1 here; the >1 case is pinned by
        # test_accept_count_math and measured on real weights
        assert s["spec_verify_rounds"] >= 1
        assert s["spec_accept_len_mean"] >= 1.0
        assert s["spec_tokens_per_dispatch"] >= s["spec_accept_len_mean"]

    def test_accept_count_math(self):
        """Acceptance = 1 + longest verified draft prefix, exactly."""
        from mxq_tpu.serving import spec
        import jax.numpy as jnp
        toks = jnp.array([[10, 1, 2, 3],     # drafts 1,2,3
                          [10, 1, 9, 3],
                          [10, 9, 9, 9],
                          [10, 1, 2, 3]])
        preds = jnp.array([[1, 2, 3, 4],     # model agrees with all 3
                           [1, 2, 3, 4],     # rejects at draft 2
                           [1, 2, 3, 4],     # rejects immediately
                           [1, 2, 3, 4]])
        act = jnp.array([True, True, True, False])
        n = np.asarray(spec._accept_count(toks, preds, act))
        assert list(n) == [4, 2, 1, 0]

    @pytest.mark.slow
    def test_random_prompt_matches_greedy(self):
        rng = np.random.RandomState(3)
        prompt = rng.randint(1, CFG.vocab_size, size=12).astype(np.int32)
        reqs, refs = self._run(prompt, 8, pipelined=True)
        assert reqs[0].generated[:8] == refs[0]

    @pytest.mark.slow
    def test_multi_request_slot_reuse(self):
        """Retirement + admission mid-chain forces drain/rebuild resyncs;
        every request must still be exact."""
        prompt = np.array([9, 10, 11] * 4, np.int32)
        reqs, refs = self._run(prompt, 6, nreq=5, pipelined=True)
        for r, ref in zip(reqs, refs):
            assert r.done and r.generated[:6] == ref

    @pytest.mark.slow
    def test_near_cache_end_falls_back(self):
        """Prompts long enough that rounds*(draft+1) would overrun max_len
        route through the synchronous fallback and stay exact."""
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=32, prefill_buckets=(16,), kv_quant=False))
        prompt = np.array([3, 4] * 6, np.int32)
        r = e.submit(prompt, max_new_tokens=12)
        spec.run_spec_pipelined(e, draft_len=4, ngram=3, rounds=4)
        ref = greedy_reference(params, CFG, prompt, 12)
        assert r.generated[:12] == ref

    def test_spec_int8_kv_matches_plain_int8_engine(self):
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array([4, 5, 6] * 5, np.int32)

        e1 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=True))
        r1 = e1.submit(prompt, max_new_tokens=8)
        e1.run()

        e2 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=True))
        r2 = e2.submit(prompt, max_new_tokens=8)
        spec.run_spec_pipelined(e2, draft_len=4, rounds=2)
        assert r2.generated[:8] == r1.generated[:8]

    def test_auto_disable_falls_back_to_plain_and_stays_exact(self):
        """With an unreachable breakeven, the acceptance-EMA auto-disable
        must route decoding through plain pipelined chunks — and outputs
        must remain exactly greedy."""
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array([4, 5, 6] * 5, np.int32)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        r = e.submit(prompt, max_new_tokens=12)
        spec.run_spec_pipelined(e, draft_len=4, rounds=2,
                                min_accept=99.0, probe_every=4)
        ref = greedy_reference(params, CFG, prompt, 12)
        assert r.generated[:12] == ref
        s = e.stats()
        assert s["spec_plain_chunks"] > 0, s

    def test_auto_disable_off_never_falls_back(self):
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array([4, 5, 6] * 5, np.int32)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        r = e.submit(prompt, max_new_tokens=8)
        spec.run_spec_pipelined(e, draft_len=4, rounds=2, min_accept=0.0)
        ref = greedy_reference(params, CFG, prompt, 8)
        assert r.generated[:8] == ref
        assert e.stats().get("spec_plain_chunks", 0) == 0

    @pytest.mark.slow
    def test_auto_disable_reprobe_interleaves_exactly(self):
        """probe_every=1 forces constant plain<->spec switching; the
        drain/rebuild resyncs must keep every token exact."""
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array([9, 10, 11] * 4, np.int32)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        reqs = [e.submit(prompt + i, max_new_tokens=7) for i in range(3)]
        spec.run_spec_pipelined(e, draft_len=3, rounds=2,
                                min_accept=99.0, probe_every=1)
        for i, r in enumerate(reqs):
            ref = greedy_reference(params, CFG, prompt + i, 7)
            assert r.done and r.generated[:7] == ref, i

    @pytest.mark.slow
    def test_spec_with_chunked_prefill_prompt(self):
        from mxq_tpu.serving import spec
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.array(list(range(2, 2 + 9)) * 4, np.int32)  # 36 > 16
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False))
        r = e.submit(prompt, max_new_tokens=6)
        spec.run_spec_pipelined(e, draft_len=3, rounds=2)
        ref = greedy_reference(params, CFG, prompt, 6)
        assert r.generated[:6] == ref


class TestStream:
    def test_stream_yields_same_tokens_as_run(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompts = [np.arange(1, 6, dtype=np.int32) + i for i in range(3)]

        e1 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False,
            horizon=3))
        r_run = [e1.submit(p, max_new_tokens=4) for p in prompts]
        e1.run()

        e2 = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False,
            horizon=3))
        r_st = [e2.submit(p, max_new_tokens=4) for p in prompts]
        seen = {r.uid: [] for r in r_st}
        for req, tok in e2.stream():
            seen[req.uid].append(tok)
        for ra, rb in zip(r_run, r_st):
            assert seen[rb.uid] == ra.generated  # same tokens, in order
            assert rb.done and rb.generated == ra.generated


class TestCancel:
    def test_cancel_queued_and_running(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=1, max_len=64, prefill_buckets=(16,), kv_quant=False,
            horizon=2))
        prompt = np.arange(1, 6, dtype=np.int32)
        r0 = e.submit(prompt, max_new_tokens=30)
        r1 = e.submit(prompt + 1, max_new_tokens=4)
        r2 = e.submit(prompt + 2, max_new_tokens=4)
        e.step()                      # r0 running
        assert e.cancel(r1)           # cancel while queued
        assert e.cancel(r0)           # cancel while running (frees the slot)
        done = e.run()                # r2 gets the slot and completes
        assert r2.done and len(r2.generated) >= 4
        assert r0.done and r1.done and len(r1.generated) == 0
        assert not e.cancel(r2)       # already finished
        ref = greedy_reference(params, CFG, prompt + 2, 4)
        assert r2.generated[:4] == ref
        assert r2 in done


@pytest.mark.slow
class TestEngineSoak:
    def test_random_workload_matches_greedy(self):
        """Soak: a stream of random-length requests through 2 slots must
        reproduce the no-cache greedy reference exactly for every request
        (exercises admission/retirement interleavings, chunked prefill, and
        the deferred first-token path under many slot-reuse patterns)."""
        params = llama.init_params(CFG, jax.random.PRNGKey(2))
        rng = np.random.RandomState(11)
        specs = [(rng.randint(2, 40), rng.randint(1, 7)) for _ in range(10)]
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=64, prefill_buckets=(16,), kv_quant=False,
            horizon=4))
        reqs = []
        for plen, n_new in specs:
            prompt = rng.randint(1, CFG.vocab_size, size=plen).astype(
                np.int32)
            reqs.append((e.submit(prompt, max_new_tokens=n_new), prompt,
                         n_new))
        done = e.run()
        assert len(done) == len(specs)
        for req, prompt, n_new in reqs:
            cap = 63 - min(len(prompt), 63)  # free cache rows after prefill
            want = min(n_new, max(cap, 1))
            ref = greedy_reference(params, CFG, prompt[-63:], want)
            assert req.generated[:want] == ref, (len(prompt), n_new)


@pytest.mark.slow
class TestPagedSoak:
    def test_paged_random_workload_matches_greedy(self):
        """Paged-engine soak: random-length requests through 2 slots must
        reproduce the greedy reference exactly (page churn, chunked paged
        prefill, slot reuse)."""
        from mxq_tpu.serving.paged import PagedEngine
        params = llama.init_params(CFG, jax.random.PRNGKey(4))
        rng = np.random.RandomState(13)
        specs = [(rng.randint(2, 40), rng.randint(1, 6)) for _ in range(8)]
        pe = PagedEngine(params, CFG, num_slots=2, total_pages=16,
                         page_size=16, max_len=64, prefill_bucket=16,
                         horizon=3)
        reqs = []
        for plen, n_new in specs:
            prompt = rng.randint(1, CFG.vocab_size, size=plen).astype(
                np.int32)
            reqs.append((pe.submit(prompt, max_new_tokens=n_new), prompt,
                         n_new))
        pe.run()
        for req, prompt, n_new in reqs:
            want = min(n_new, max(1, 60 - len(prompt)))
            ref = greedy_reference(params, CFG, prompt[-63:], want)
            got = req.generated[:want]
            assert got == ref[:len(got)] and len(got) >= 1, (len(prompt),
                                                             n_new)


class TestSampling:
    def _engine(self, params, **kw):
        base = dict(num_slots=2, max_len=64, prefill_buckets=(16,),
                    kv_quant=False)
        base.update(kw)
        return eng.Engine(params, CFG, eng.EngineConfig(**base))

    def test_top_k1_equals_greedy(self):
        """top_k=1 sampling must reduce to greedy exactly, any temperature."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(1, 9, dtype=np.int32)
        ref = greedy_reference(params, CFG, prompt, 6)
        e = self._engine(params, greedy=False, temperature=0.9, top_k=1)
        req = e.submit(prompt, max_new_tokens=6)
        e.run()
        assert req.generated[:6] == ref

    def test_sampling_deterministic_per_seed(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(1, 9, dtype=np.int32)
        outs = []
        for seed in (7, 7, 8):
            e = self._engine(params, greedy=False, temperature=1.0,
                             top_k=50, seed=seed)
            req = e.submit(prompt, max_new_tokens=8)
            e.run()
            outs.append(list(req.generated[:8]))
        assert outs[0] == outs[1]           # same seed -> same stream
        assert len(outs[2]) == 8            # different seed still completes

    @pytest.mark.slow
    def test_paged_chunked_prefill_matches_greedy(self):
        """Prompts longer than the paged prefill bucket continue in chunks
        and must reproduce the greedy reference exactly."""
        from mxq_tpu.serving.paged import PagedEngine
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(9)
        prompt = rng.randint(1, CFG.vocab_size, size=40).astype(np.int32)
        ref = greedy_reference(params, CFG, prompt, 5)
        pe = PagedEngine(params, CFG, num_slots=2, total_pages=32,
                         page_size=16, max_len=128, prefill_bucket=16,
                         horizon=4)
        req = pe.submit(prompt, max_new_tokens=5)
        pe.run()
        assert req.generated[:5] == ref

    def test_paged_sampling_top_k1_equals_greedy(self):
        from mxq_tpu.serving.paged import PagedEngine
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(1, 9, dtype=np.int32)
        ref = greedy_reference(params, CFG, prompt, 5)
        pe = PagedEngine(params, CFG, num_slots=2, total_pages=16,
                         page_size=16, max_len=64, prefill_bucket=16,
                         horizon=4, greedy=False, temperature=0.8, top_k=1)
        req = pe.submit(prompt, max_new_tokens=5)
        pe.run()
        assert req.generated[:5] == ref

    def test_top_p_masks_tail(self):
        """With a tiny top_p every sampled token must be the argmax (the
        nucleus keeps at least the top token)."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        prompt = np.arange(1, 9, dtype=np.int32)
        ref = greedy_reference(params, CFG, prompt, 5)
        e = self._engine(params, greedy=False, temperature=1.0, top_p=1e-9)
        req = e.submit(prompt, max_new_tokens=5)
        e.run()
        assert req.generated[:5] == ref


class TestLongPrompt:
    def test_overlong_prompt_keeps_tail(self):
        """Prompts longer than the cache keep the LAST max_len-1 tokens
        (ADVICE r1: head-truncation attended uninit KV rows)."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(3)
        prompt = rng.randint(1, CFG.vocab_size, size=40).astype(np.int32)
        # a max_len-1 tail fills the cache: exactly one decoded token fits,
        # and it must condition on the TAIL of the prompt
        ref = greedy_reference(params, CFG, prompt[-31:], 1)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=32, prefill_buckets=(16,), kv_quant=False))
        req = e.submit(prompt, max_new_tokens=4)
        e.run()
        assert req.done and req.generated[:1] == ref

    def test_chunked_prefill_matches_single_bucket(self):
        """Prompts longer than the largest bucket prefill in chunks and must
        generate exactly what a single big-bucket prefill generates."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(4)
        prompt = rng.randint(1, CFG.vocab_size, size=40).astype(np.int32)
        n_new = 5
        ref = greedy_reference(params, CFG, prompt, n_new)
        for buckets in ((16,), (64,)):
            e = eng.Engine(params, CFG, eng.EngineConfig(
                num_slots=2, max_len=128, prefill_buckets=buckets,
                kv_quant=False))
            req = e.submit(prompt, max_new_tokens=n_new)
            e.run()
            assert req.generated[:n_new] == ref, buckets

    def test_chunked_prefill_bucket_overruns_cache_end(self):
        """Final-chunk window would overrun max_len (buckets don't divide
        it): the window must SHIFT left (recomputing overlap rows), never
        let dynamic_update_slice clamp the write start."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(6)
        prompt = rng.randint(1, CFG.vocab_size, size=79).astype(np.int32)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=1, max_len=80, prefill_buckets=(64,), kv_quant=False))
        req = e.submit(prompt, max_new_tokens=1)
        e.run()
        ref = greedy_reference(params, CFG, prompt, 1)
        assert req.generated[:1] == ref

    def test_chunked_prefill_quant_kv(self):
        """Chunked prefill through the int8 KV cache path runs and matches
        the single-bucket int8 engine."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(5)
        prompt = rng.randint(1, CFG.vocab_size, size=40).astype(np.int32)
        n_new = 4
        outs = []
        for buckets in ((16,), (64,)):
            e = eng.Engine(params, CFG, eng.EngineConfig(
                num_slots=2, max_len=128, prefill_buckets=buckets,
                kv_quant=True))
            req = e.submit(prompt, max_new_tokens=n_new)
            e.run()
            outs.append(list(req.generated[:n_new]))
        assert outs[0] == outs[1], outs


class TestNearCapacity:
    """Admission at plen = max_len-1 under the pipelined loop (horizon 8):
    the fixed-active-mask dispatch must never write KV at positions >=
    max_len (the fused write kernel requires S > max(positions),
    ops/attn_int8.py; jnp scatters would silently drop). The decode chunk
    clamps overflow steps' write rows to max_len-1 and zeroes their
    tokens (engine._decode_chunk_impl)."""

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_admit_at_max_len_minus_one_horizon8(self, kv_quant):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        max_len = 16
        full = rng.randint(1, CFG.vocab_size, size=max_len - 1).astype(
            np.int32)
        short = rng.randint(1, CFG.vocab_size, size=4).astype(np.int32)
        n_short = 5
        ref_full = greedy_reference(params, CFG, full, 1)
        ref_short = greedy_reference(params, CFG, short, n_short)
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=max_len, prefill_buckets=(max_len,),
            kv_quant=kv_quant, horizon=8))
        rf = e.submit(full, max_new_tokens=8)      # cache-full after 1 token
        rs = e.submit(short, max_new_tokens=n_short)
        done = e.run()
        assert len(done) == 2
        # full slot: exactly one real token (retired cache-full), and no
        # overflow-step garbage leaked into generated
        assert len(rf.generated) == 1
        if not kv_quant:
            assert rf.generated[:1] == ref_full
        # co-active short request is unaffected by the neighbor's overflow
        if not kv_quant:
            assert rs.generated[:n_short] == ref_short
        else:
            assert rs.generated[0] == ref_short[0]

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_overflow_steps_clamp_and_zero(self, kv_quant):
        """Direct decode-chunk check: from position max_len-2 with horizon
        8, steps i>=2 are out of range — their tokens must be 0 and no
        cache row below max_len-1 may differ from a horizon-2 run (the
        clamped overflow writes land only on the last row, which is dead:
        the slot is retired and any later occupant rewrites it before
        reading)."""
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        max_len = 16
        e = eng.Engine(params, CFG, eng.EngineConfig(
            num_slots=2, max_len=max_len, prefill_buckets=(max_len,),
            kv_quant=kv_quant, horizon=8))
        caches0 = jax.tree_util.tree_map(jnp.copy, e.caches)
        b = 2
        chained = jnp.zeros((b,), jnp.int32)
        host = jnp.array([3, 5], jnp.int32)
        use_chain = jnp.zeros((b,), bool)
        positions = jnp.array([max_len - 2, 2], jnp.int32)
        active = jnp.ones((b,), bool)
        key = jax.random.PRNGKey(0)
        toks8, c8 = e._decode(params, jax.tree_util.tree_map(
            jnp.copy, caches0), chained, host, use_chain, positions,
            active, key, horizon=8)
        toks2, c2 = e._decode(params, jax.tree_util.tree_map(
            jnp.copy, caches0), chained, host, use_chain, positions,
            active, key, horizon=2)
        toks8 = np.asarray(toks8)
        # slot 0 runs out of rows after step 1; overflow tokens zeroed
        assert (toks8[2:, 0] == 0).all(), toks8[:, 0]
        # slot 1 keeps decoding normally
        assert (toks8[:2] == np.asarray(toks2)).all()
        # every cache row except the last matches the horizon-2 run for
        # slot 0 (overflow writes only touch the clamped last row)
        seq_axis = {"k_codes": 3, "k_scale": 3, "v_codes": 3, "v_scale": 3,
                    "k": 2, "v": 2}
        for name in c8:
            a = np.asarray(c8[name])
            bb = np.asarray(c2[name])
            ax = seq_axis[name]
            sl = [slice(None)] * a.ndim
            sl[ax] = slice(0, max_len - 1)
            sl[1] = slice(0, 1)                      # slot 0
            assert (a[tuple(sl)] == bb[tuple(sl)]).all(), name


class TestStackedInt8Attention:
    def test_stacked_matches_unstacked(self):
        """The scalar-prefetch stacked variant must equal the per-layer
        kernel on every layer of the stack."""
        from mxq_tpu.ops import attn_int8
        l, b, hq, hkv, s, d = 3, 2, 8, 4, 32, 64
        keys = jax.random.split(jax.random.PRNGKey(7), 5)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
        kc = jax.random.randint(keys[1], (l, b, hkv, s, d), -127, 128,
                                jnp.int8)
        vc = jax.random.randint(keys[2], (l, b, hkv, s, d), -127, 128,
                                jnp.int8)
        ks = (jax.random.uniform(keys[3], (l, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        vs = (jax.random.uniform(keys[4], (l, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        positions = jnp.array([5, 31], jnp.int32)
        for li in range(l):
            got = attn_int8.int8_decode_attention_stacked(
                q, kc, ks, vc, vs, jnp.int32(li), positions)
            want = attn_int8.int8_decode_attention(
                q, kc[li], ks[li], vc[li], vs[li], positions)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6, err_msg=str(li))


class TestSingleSlotPackedEngine:
    def test_num_slots_1_matches_multi_slot(self):
        """Single-stream serving (num_slots=1) routes B=1 decode GEMVs
        through the STACKED bdg body; generations must equal the 2-slot
        packed engine's for the same prompt."""
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(2))
        packed = llama.quantize_params_packed(params, cfg)
        prompt = np.arange(5, dtype=np.int32) + 11
        outs = []
        for slots in (1, 2):
            e = eng.Engine(packed, cfg, eng.EngineConfig(
                num_slots=slots, max_len=64, prefill_buckets=(16,),
                kv_quant=False))
            r = e.submit(prompt, max_new_tokens=6)
            e.run()
            outs.append(list(r.generated[:6]))
        assert outs[0] == outs[1], outs


class TestPackedLMHead:
    def test_u4_lm_head_logit_parity_and_engine(self):
        """EngineConfig.lm_head_bits=4 packs lm_head to uniform-4b; logits
        must match the fake-quant-u4 dense head exactly, and generation
        must match an engine running the same u4 head densely."""
        from mxq_tpu.ops import uniform4
        from mxq_tpu.serving.engine import Engine, EngineConfig
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(5))
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, cfg.hidden_size),
                              jnp.float32).astype(jnp.bfloat16)

        head = jnp.asarray(params["lm_head"])
        packed = uniform4.quantize_pack_u4(head.T)
        y_packed = uniform4.u4_matmul(x, packed)
        y_dense = x @ uniform4.fake_quant_u4(head.T).T.astype(x.dtype)
        np.testing.assert_allclose(np.asarray(y_packed, np.float32),
                                   np.asarray(y_dense, np.float32),
                                   rtol=2e-2, atol=2e-2)

        ecfg = EngineConfig(num_slots=2, max_len=32, prefill_buckets=(8,),
                            kv_quant=False, lm_head_bits=4)
        eng = Engine(params, cfg, ecfg)
        assert hasattr(eng.params["lm_head"], "w")  # packed
        prompts = [np.array([1, 5, 9], np.int32)]
        req = eng.submit(prompts[0], max_new_tokens=4)
        eng.run()
        # oracle: dense forward with the fake-quant-u4 head
        dense = dict(params, lm_head=uniform4.fake_quant_u4(
            head.T).T.astype(head.dtype))
        toks = list(prompts[0])
        for _ in range(4):
            logits, _ = llama.forward(dense, jnp.asarray([toks]), cfg)
            toks.append(int(jnp.argmax(logits[0, -1])))
        assert list(req.generated)[:4] == toks[len(prompts[0]):]

    def test_paged_int8_kernel_parity(self):
        """int8_paged_decode_attention vs gather-dequant-softmax oracle:
        multi-page sequences, partial last pages, a null-page slot."""
        from mxq_tpu.ops import attn_int8 as A
        B, HQ, HKV, D = 3, 8, 4, 128
        P, PAGE, PPS = 9, A.PAGE_INT8, 3
        ks_ = jax.random.split(jax.random.PRNGKey(0), 6)
        q = jax.random.normal(ks_[0], (B, HQ, D), jnp.float32)
        kp = jax.random.randint(ks_[1], (HKV, P, PAGE, D), -127, 128,
                                jnp.int8)
        vp = jax.random.randint(ks_[2], (HKV, P, PAGE, D), -127, 128,
                                jnp.int8)
        ksc = (jax.random.uniform(ks_[3], (HKV, P, 1, PAGE)) * 0.02
               + 1e-3).astype(jnp.bfloat16)
        vsc = (jax.random.uniform(ks_[4], (HKV, P, 1, PAGE)) * 0.02
               + 1e-3).astype(jnp.bfloat16)
        tables = jnp.array([[1, 2, 3], [4, 5, 0], [6, 7, 8]], jnp.int32)
        lengths = jnp.array([300, 129, 384], jnp.int32)
        out = A.int8_paged_decode_attention(q, kp, ksc, vp, vsc, lengths,
                                            tables)

        def gather(pages, scales):
            k = pages[:, tables].astype(jnp.float32) * scales[
                :, tables].transpose(0, 1, 2, 4, 3).astype(jnp.float32)
            return k.transpose(1, 0, 2, 3, 4).reshape(B, HKV, PPS * PAGE,
                                                      D)
        kd, vd = gather(kp, ksc), gather(vp, vsc)
        rep = HQ // HKV
        kd = jnp.repeat(kd, rep, axis=1)
        vd = jnp.repeat(vd, rep, axis=1)
        st = jnp.einsum("bhd,bhsd->bhs", q, kd) / np.sqrt(D)
        mask = jnp.arange(PPS * PAGE)[None, None, :] < lengths[:, None,
                                                              None]
        st = jnp.where(mask, st, -1e30)
        pr = jax.nn.softmax(st, -1)
        ref = jnp.einsum("bhs,bhsd->bhd", pr, vd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    def test_folded_read_matches_cur(self):
        """int8_decode_attention_cur_folded (folded-stack read, ctx-only
        output) must match int8_decode_attention_cur on the layer view
        bit-for-bit."""
        from mxq_tpu.ops import attn_int8
        L, b, hq, hkv, s, d = 3, 3, 8, 4, 32, 64
        keys = jax.random.split(jax.random.PRNGKey(13), 7)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.float32)
        kc = jax.random.randint(keys[1], (L, b, hkv, s, d), -127, 128,
                                jnp.int8)
        vc = jax.random.randint(keys[2], (L, b, hkv, s, d), -127, 128,
                                jnp.int8)
        ks = (jax.random.uniform(keys[3], (L, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        vs = (jax.random.uniform(keys[4], (L, b, hkv, s)) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
        kcur = jax.random.randint(keys[5], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        vcur = jax.random.randint(keys[6], (b, hkv, 1, d), -127, 128,
                                  jnp.int8)
        kscur = jnp.full((b, hkv, 1), 0.015, jnp.bfloat16)
        vscur = jnp.full((b, hkv, 1), 0.012, jnp.bfloat16)
        positions = jnp.array([0, 11, s - 1], jnp.int32)
        for idx in range(L):
            out = attn_int8.int8_decode_attention_cur_folded(
                q, kc, ks, vc, vs, kcur, kscur, vcur, vscur,
                jnp.int32(idx), positions)
            ref = attn_int8.int8_decode_attention_cur(
                q, kc[idx], ks[idx], vc[idx], vs[idx],
                kcur, kscur, vcur, vscur, positions)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
