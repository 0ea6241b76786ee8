"""Paged KV cache tests: pool accounting, paged decode matches dense decode,
paged engine end-to-end vs greedy reference."""

import numpy as np
import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from mxq_tpu.serving import paged
from tests.test_serving import greedy_reference

CFG = llama.LlamaConfig.tiny()


def test_pool_accounting():
    pool = paged.PagedPool.create(CFG, num_slots=2, total_pages=8,
                                  page_size=16, max_len=64)
    pool.ensure_capacity(0, 40)   # 3 pages
    assert (pool.page_tables[0] != 0).sum() == 3
    free_before = len(pool.free_pages)
    pool.release(0)
    assert len(pool.free_pages) == free_before + 3
    assert (pool.page_tables[0] == 0).all()


def test_paged_engine_matches_greedy():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = np.arange(5, dtype=np.int32) + 7
    n_new = 5
    ref = greedy_reference(params, CFG, prompt, n_new)
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=16,
                          page_size=16, max_len=64, prefill_bucket=16)
    req = e.submit(prompt, max_new_tokens=n_new)
    done = e.run()
    assert len(done) == 1
    assert req.generated[:n_new] == ref


def test_paged_engine_multi_request_slot_reuse():
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=16,
                          page_size=16, max_len=64, prefill_bucket=16)
    reqs = [e.submit(np.arange(4, dtype=np.int32) + i, max_new_tokens=3)
            for i in range(4)]
    done = e.run()
    assert len(done) == 4
    for i, r in enumerate(reqs):
        ref = greedy_reference(params, CFG, np.arange(4, dtype=np.int32) + i, 3)
        assert r.generated[:3] == ref, i
    # all pages returned to the pool
    assert (e.pool.page_tables == 0).all()
