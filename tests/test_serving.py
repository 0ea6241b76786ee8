"""Serving engine tests: KV quant roundtrip, continuous batching correctness
(engine generations == plain greedy decode), slot reuse."""

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
