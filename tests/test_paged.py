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


def test_int8_pool_write_and_attend_parity():
    """Quantized-pool write + paged int8 attention vs a dense int8
    attention reference over the gathered pages (both engines share
    kvcache.quantize_kv semantics, so codes must agree exactly)."""
    from mxq_tpu.serving import kvcache
    from mxq_tpu.ops import attn_int8

    kvh, d, b = 2, 32, 3
    pool = paged.PagedPool.create(CFG, num_slots=b, total_pages=8,
                                  max_len=256, kv_bits=8)
    ps = pool.page_size
    assert ps == attn_int8.PAGE_INT8
    key = jax.random.PRNGKey(0)
    kp, vp = pool.k_pages, pool.v_pages

    # write 3 tokens per slot (layer-stacked path, like decode)
    L = CFG.num_hidden_layers
    hkv, dd = CFG.num_key_value_heads, CFG.head_dim
    toks = []
    for t in range(3):
        kn = jax.random.normal(jax.random.fold_in(key, 2 * t),
                               (b, hkv, dd), jnp.float32)
        vn = jax.random.normal(jax.random.fold_in(key, 2 * t + 1),
                               (b, hkv, dd), jnp.float32)
        toks.append((kn, vn))
        page_ids = jnp.full((b,), 1, jnp.int32) + jnp.arange(b)
        offsets = jnp.full((b,), t, jnp.int32)
        for idx in range(L):
            kp, vp = paged.write_tokens(
                kp, vp, kn, vn, page_ids, offsets,
                layer_idx=jnp.int32(idx),
                pages_per_layer=pool.pages_per_layer)

    # attend with the paged kernel on layer 0's slice of the FOLDED pool
    ppl = pool.pages_per_layer
    view = lambda p: jax.tree.map(lambda a: a[:, :ppl], p)   # noqa: E731
    q = jax.random.normal(jax.random.fold_in(key, 99), (b, hkv, dd),
                          jnp.float32)
    tables = (jnp.arange(b)[:, None] + 1).astype(jnp.int32)   # 1 page/slot
    lengths = jnp.full((b,), 3, jnp.int32)
    out = paged.paged_attend(q, view(kp), view(vp), lengths, tables)

    # dense int8 reference: quantize the same rows with the same math
    kc = np.zeros((b, hkv, ps, dd), np.int8)
    ks = np.zeros((b, hkv, ps), np.float32)
    vc = np.zeros_like(kc)
    vs = np.zeros_like(ks)
    for t, (kn, vn) in enumerate(toks):
        c, s = kvcache.quantize_kv(kn, dd)
        kc[:, :, t] = np.asarray(c)
        ks[:, :, t] = np.asarray(s[..., 0], np.float32)
        c, s = kvcache.quantize_kv(vn, dd)
        vc[:, :, t] = np.asarray(c)
        vs[:, :, t] = np.asarray(s[..., 0], np.float32)
    # pool codes must match the dense quantization bit-for-bit
    kp0 = np.asarray(view(kp)["codes"])   # [KVH, P, ps, D]
    for bi in range(b):
        np.testing.assert_array_equal(kp0[:, 1 + bi, :3],
                                      kc[bi, :, :3])
    ref = attn_int8.int8_decode_attention_reference(
        q, jnp.asarray(kc), jnp.asarray(ks, jnp.bfloat16),
        jnp.asarray(vc), jnp.asarray(vs, jnp.bfloat16),
        jnp.full((b,), 2, jnp.int32))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_paged_engine_int8_kv():
    """PagedEngine with the quantized pool generates; first tokens match
    the exact greedy reference (int8 KV can flip a low-margin argmax late
    in the rollout, like the dense int8 engine)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = np.arange(5, dtype=np.int32) + 7
    n_new = 5
    ref = greedy_reference(params, CFG, prompt, n_new)
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=16,
                          max_len=256, prefill_bucket=16, kv_bits=8)
    assert e.pool.page_size == 128
    req = e.submit(prompt, max_new_tokens=n_new)
    e.run()
    assert req.generated[:2] == ref[:2]
    agree = sum(int(a == b) for a, b in zip(req.generated[:n_new], ref))
    assert agree >= n_new - 1, (req.generated, ref)
    # pages released
    assert (e.pool.page_tables == 0).all()


def test_prefix_caching_shares_pages_and_matches_greedy():
    """Identical prompts share their full prefix pages (refcounted); the
    cached-prefix generation is token-identical to the uncached one."""
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    prompt = (np.arange(40, dtype=np.int32) % 50) + 3   # 2 full pages @16
    n_new = 4
    ref = greedy_reference(params, CFG, prompt, n_new)

    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=32,
                          page_size=16, max_len=128, prefill_bucket=16)
    r1 = e.submit(prompt, max_new_tokens=n_new)
    e.run()
    assert r1.generated[:n_new] == ref
    # prompt pages are now cached (refcount 0, still indexed)
    assert len(e.pool.prefix_index) == 2
    free_before = len(e.pool.free_pages)

    r2 = e.submit(prompt, max_new_tokens=n_new)
    e.run()
    assert r2.generated[:n_new] == ref          # exactness through cache
    # the two prefix pages were RE-ACQUIRED, not re-allocated: the pool
    # consumed fewer fresh pages than a cold prefill would
    assert len(e.pool.free_pages) == free_before
    assert (e.pool.refs == 0).all()

    # different prompt with the same FIRST page shares only that page
    p2 = prompt.copy()
    p2[20:] = 7
    r3 = e.submit(p2, max_new_tokens=n_new)
    e.run()
    ref3 = greedy_reference(params, CFG, p2, n_new)
    assert r3.generated[:n_new] == ref3
    assert len(e.pool.prefix_index) >= 3        # second page of p2 added


def test_prefix_cache_concurrent_sharing_and_invalidation():
    """Two live sequences share prefix pages (refcount 2); reallocating a
    cached page for new content drops its index entry."""
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    prompt = (np.arange(36, dtype=np.int32) % 50) + 3
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=16,
                          page_size=16, max_len=64, prefill_bucket=16)
    r1 = e.submit(prompt, max_new_tokens=3)
    r2 = e.submit(prompt, max_new_tokens=3)
    e.run()
    assert r1.generated == r2.generated
    assert (e.pool.refs == 0).all()
    # churn the pool with distinct prompts until cached pages recycle
    for i in range(6):
        e.submit((np.arange(36, dtype=np.int32) % 40) + 5 + i,
                 max_new_tokens=2)
    e.run()
    # every index entry must point at a page whose content still matches
    # (invariant: reallocated pages were dropped from the index)
    for h, p in e.pool.prefix_index.items():
        assert e.pool.page_key.get(p) == h


def test_prefix_caching_int8_pool():
    """Prefix sharing over the QUANTIZED page pool stays exact (codes are
    deterministic functions of the prefix)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(4))
    prompt = (np.arange(300, dtype=np.int32) % 50) + 3  # 2 full pages @128
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=12,
                          max_len=512, prefill_bucket=128, kv_bits=8)
    r1 = e.submit(prompt, max_new_tokens=3)
    e.run()
    assert len(e.pool.prefix_index) == 2
    r2 = e.submit(prompt, max_new_tokens=3)
    e.run()
    assert r2.generated == r1.generated
    assert (e.pool.refs == 0).all()


def test_admit_rollback_on_pool_exhaustion():
    """A failed admit (pool exhausted mid-prefill) must roll back the
    slot's acquired pages: shared prefix refcounts return to their prior
    values and the slot's table is cleared, so no later admit can adopt
    pages a live sequence still reads."""
    import pytest
    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    prompt = (np.arange(36, dtype=np.int32) % 50) + 3   # needs 3 pages
    # 3 usable pages total: request 1 takes all 3; request 2 shares the
    # 2 full prefix pages (refs -> 2) but cannot allocate its tail page
    e = paged.PagedEngine(params, CFG, num_slots=2, total_pages=4,
                          page_size=16, max_len=48, prefill_bucket=16)
    r1 = e.submit(prompt, max_new_tokens=2)
    # admit r1 alone first so it holds the pool
    e.pool.ensure_capacity  # (no-op ref, clarity)
    e._admit([])
    assert e.slot_req[0] is r1
    pages_r1 = [int(p) for p in e.pool.page_tables[0] if p != 0]
    assert len(pages_r1) == 3
    r2 = e.submit(prompt, max_new_tokens=2)
    with pytest.raises(RuntimeError, match="exhausted"):
        e._admit([])
    # rollback: r2 re-queued, slot 1 table clean, refs back to r1-only
    assert e.queue and e.queue[0] is r2
    assert (e.pool.page_tables[1] == 0).all()
    for p in range(1, 4):
        assert e.pool.refs[p] == (1 if p in pages_r1 else 0)


def test_paged_cur_kernel_matches_write_then_attend():
    """Deferred-write paged attention (cur token out-of-cache) must equal
    write-then-attend through the plain paged kernel: same pool, same
    quantized row, positions[b] = the row being written."""
    import jax.numpy as jnp
    from mxq_tpu.ops import attn_int8
    from mxq_tpu.serving import kvcache

    kvh, d, b = 4, 128, 3
    ps = attn_int8.PAGE_INT8
    npool, pps = 8, 2
    key = jax.random.PRNGKey(0)
    kc = jax.random.randint(key, (kvh, npool, ps, d), -127, 128, jnp.int8)
    ks = (jax.random.uniform(key, (kvh, npool, 1, ps)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    vc = jax.random.randint(jax.random.fold_in(key, 1),
                            (kvh, npool, ps, d), -127, 128, jnp.int8)
    vs = (jax.random.uniform(jax.random.fold_in(key, 2),
                             (kvh, npool, 1, ps)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    tables = jnp.array([[1, 2], [3, 4], [5, 6]], jnp.int32)
    positions = jnp.array([ps - 1, 5, ps + 17], jnp.int32)  # write rows
    q = jax.random.normal(jax.random.fold_in(key, 3), (b, kvh * 2, d),
                          jnp.float32)
    knew = jax.random.normal(jax.random.fold_in(key, 4), (b, kvh, d),
                             jnp.float32)
    vnew = jax.random.normal(jax.random.fold_in(key, 5), (b, kvh, d),
                             jnp.float32)
    kcod, kscl = kvcache.quantize_kv(knew, d)
    vcod, vscl = kvcache.quantize_kv(vnew, d)
    kscl, vscl = kscl[..., 0], vscl[..., 0]

    out_cur = attn_int8.int8_paged_decode_attention_cur(
        q, kc, ks, vc, vs, kcod, kscl, vcod, vscl, positions, tables)

    # write the row, then attend with lengths = pos + 1
    pid = tables[jnp.arange(b), positions // ps]
    off = positions % ps
    kc2 = kc.at[:, pid, off].set(kcod.transpose(1, 0, 2))
    ks2 = ks.at[:, pid, 0, off].set(kscl.astype(jnp.bfloat16).T)
    vc2 = vc.at[:, pid, off].set(vcod.transpose(1, 0, 2))
    vs2 = vs.at[:, pid, 0, off].set(vscl.astype(jnp.bfloat16).T)
    out_ref = attn_int8.int8_paged_decode_attention(
        q, kc2, ks2, vc2, vs2, positions + 1, tables)
    np.testing.assert_allclose(np.asarray(out_cur), np.asarray(out_ref),
                               rtol=2e-2, atol=2e-2)


def test_paged_attend_update_matches_write_then_attend():
    """FUSED paged write+attend (aliased in-kernel octet writes) must
    produce the same ctx as write-then-attend AND leave the pool equal to
    an explicit row write."""
    import jax.numpy as jnp
    from mxq_tpu.ops import attn_int8
    from mxq_tpu.serving import kvcache

    kvh, d, b = 4, 128, 3
    ps = attn_int8.PAGE_INT8
    npool = 8
    key = jax.random.PRNGKey(7)
    kc = jax.random.randint(key, (kvh, npool, ps, d), -127, 128, jnp.int8)
    ks = (jax.random.uniform(key, (kvh, npool, 1, ps)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    vc = jax.random.randint(jax.random.fold_in(key, 1),
                            (kvh, npool, ps, d), -127, 128, jnp.int8)
    vs = (jax.random.uniform(jax.random.fold_in(key, 2),
                             (kvh, npool, 1, ps)) * 0.02 + 1e-3
          ).astype(jnp.bfloat16)
    tables = jnp.array([[1, 2], [3, 4], [5, 6]], jnp.int32)
    positions = jnp.array([ps - 1, 5, ps + 17], jnp.int32)
    q = jax.random.normal(jax.random.fold_in(key, 3), (b, kvh * 2, d),
                          jnp.float32)
    knew = jax.random.normal(jax.random.fold_in(key, 4), (b, kvh, d),
                             jnp.float32)
    vnew = jax.random.normal(jax.random.fold_in(key, 5), (b, kvh, d),
                             jnp.float32)
    kcod, kscl = kvcache.quantize_kv(knew, d)
    vcod, vscl = kvcache.quantize_kv(vnew, d)
    kscl, vscl = kscl[..., 0], vscl[..., 0]

    nulls = jnp.zeros((b,), jnp.int32)    # page 0 = null by convention
    ctx, kc2, ks2, vc2, vs2 = attn_int8.int8_paged_decode_attend_update(
        q, kc, ks, vc, vs, kcod, kscl, vcod, vscl, positions, tables,
        nulls)

    pid = tables[jnp.arange(b), positions // ps]
    off = positions % ps
    kc_ref = kc.at[:, pid, off].set(kcod.transpose(1, 0, 2))
    ks_ref = ks.at[:, pid, 0, off].set(kscl.astype(jnp.bfloat16).T)
    vc_ref = vc.at[:, pid, off].set(vcod.transpose(1, 0, 2))
    vs_ref = vs.at[:, pid, 0, off].set(vscl.astype(jnp.bfloat16).T)
    ctx_ref = attn_int8.int8_paged_decode_attention(
        q, kc_ref, ks_ref, vc_ref, vs_ref, positions + 1, tables)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               rtol=2e-2, atol=2e-2)
    # page 0 is the NULL page: non-write grid steps park their output
    # windows there (garbage by design, never read) — compare the rest
    np.testing.assert_array_equal(np.asarray(kc2)[:, 1:],
                                  np.asarray(kc_ref)[:, 1:])
    np.testing.assert_array_equal(np.asarray(vc2)[:, 1:],
                                  np.asarray(vc_ref)[:, 1:])
    np.testing.assert_array_equal(np.asarray(ks2, np.float32)[:, 1:],
                                  np.asarray(ks_ref, np.float32)[:, 1:])
    np.testing.assert_array_equal(np.asarray(vs2, np.float32)[:, 1:],
                                  np.asarray(vs_ref, np.float32)[:, 1:])
