"""Multi-device tests on the 8-device virtual CPU mesh: sharded forward
parity, sharded KD train step, packed-weight sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxq_tpu.models import llama
from mxq_tpu.parallel import sharding
from mxq_tpu.qat import train

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = llama.LlamaConfig.tiny()


def test_sharded_forward_matches_single_device():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jnp.arange(32).reshape(4, 8)
    ref, _ = llama.forward(params, ids, CFG)

    mesh = sharding.make_mesh(dp=2, fsdp=2, tp=2)
    sp = sharding.shard_params(params, mesh)
    ids_s = sharding.shard_batch(ids, mesh)
    out, _ = jax.jit(lambda p, i: llama.forward(p, i, CFG))(sp, ids_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_specs_cover_all_params():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    specs = sharding.param_specs(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(specs,
                                       is_leaf=lambda x: isinstance(
                                           x, jax.sharding.PartitionSpec))
    assert len(flat_p) == len(flat_s)


@pytest.mark.slow
def test_sharded_train_step_runs_and_is_finite():
    cfg = llama.LlamaConfig.tiny(w_bits=2)
    mesh = sharding.make_mesh(dp=1, fsdp=2, tp=4)
    params = sharding.shard_params(
        llama.init_params(cfg, jax.random.PRNGKey(0)), mesh)
    teacher = sharding.shard_params(
        llama.init_params(CFG, jax.random.PRNGKey(1)), mesh)
    tc = train.TrainConfig(total_steps=4, remat=True)
    opt = train.make_optimizer(tc)
    opt_state = jax.jit(opt.init)(params)
    step = jax.jit(train.make_train_step(cfg, tc, opt))
    batch = sharding.shard_batch(
        {"input_ids": jnp.ones((4, 16), jnp.int32)}, mesh)
    p2, opt_state, metrics = step(params, teacher, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                               params, p2)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_packed_params_shardable():
    from mxq_tpu import packfmt
    cfg = llama.LlamaConfig.tiny(num_hidden_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    packed = llama.quantize_params_packed(params, cfg)
    mesh = sharding.make_mesh(dp=1, fsdp=2, tp=2)
    sp = sharding.shard_params(packed, mesh, packed=True)
    ids = jnp.arange(8).reshape(1, 8)
    out, _ = jax.jit(lambda p, i: llama.forward(p, i, cfg))(sp, ids)
    ref, _ = llama.forward(packed, ids, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sharded_packed_decode_with_cache():
    """Multi-chip serving path: packed weights tp/fsdp-sharded, KV cache
    sharded over heads (tp), one decode step on the virtual mesh."""
    from mxq_tpu.models.llama import quantize_params_packed
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    packed = quantize_params_packed(params, cfg, fuse=True)
    ref_logits, _ = llama.forward(packed, jnp.arange(4)[None].repeat(2, 0),
                                  cfg)

    mesh = sharding.make_mesh(dp=1, fsdp=2, tp=2)
    sp = sharding.shard_params(packed, mesh, packed=True)
    caches = llama.init_cache(cfg, 2, 16, dtype=jnp.float32)
    cache_spec = P(None, None, None, "tp", None)  # [L, B, S, H, D]
    caches = jax.tree_util.tree_map(
        lambda c: jax.device_put(c, NamedSharding(mesh, cache_spec)), caches)
    ids = jnp.arange(4)[None].repeat(2, 0)
    logits, new_caches = jax.jit(
        lambda p, i, c: llama.forward(p, i, cfg, caches=c, cache_pos=0))(
            sp, ids, caches)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_engine_on_sharded_packed_params():
    """Multi-chip serving end to end: the continuous-batching Engine runs
    with tp/fsdp-sharded packed weights and a tp-sharded KV cache on the
    virtual mesh, and its generations match the unsharded engine."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mxq_tpu.serving import engine as eng

    cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    packed = llama.quantize_params_packed(params, cfg, fuse=True)
    prompt = np.arange(6, dtype=np.int32) + 3

    e_ref = eng.Engine(packed, cfg, eng.EngineConfig(
        num_slots=2, max_len=32, prefill_buckets=(8,), kv_quant=False,
        horizon=4))
    r_ref = e_ref.submit(prompt, max_new_tokens=5)
    e_ref.run()

    mesh = sharding.make_mesh(dp=1, fsdp=2, tp=2)
    sp = sharding.shard_params(packed, mesh, packed=True)
    e = eng.Engine(sp, cfg, eng.EngineConfig(
        num_slots=2, max_len=32, prefill_buckets=(8,), kv_quant=False,
        horizon=4))
    cache_spec = P(None, None, None, "tp", None)   # [L, B, S, H, D]
    e.caches = jax.tree_util.tree_map(
        lambda c: jax.device_put(c, NamedSharding(mesh, cache_spec)),
        e.caches)
    r = e.submit(prompt, max_new_tokens=5)
    e.run()
    assert r.generated == r_ref.generated, (r.generated, r_ref.generated)


@pytest.mark.slow
def test_spec_decode_on_sharded_packed_params():
    """Speculative decoding over tp/fsdp-sharded packed weights matches the
    unsharded greedy engine exactly."""
    from mxq_tpu.serving import engine as eng
    from mxq_tpu.serving import spec

    cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    packed = llama.quantize_params_packed(params, cfg, fuse=True)
    prompt = np.array([3, 4, 5] * 4, np.int32)

    e_ref = eng.Engine(packed, cfg, eng.EngineConfig(
        num_slots=2, max_len=32, prefill_buckets=(8,), kv_quant=False,
        horizon=4))
    r_ref = e_ref.submit(prompt, max_new_tokens=5)
    e_ref.run()

    mesh = sharding.make_mesh(dp=1, fsdp=2, tp=2)
    sp = sharding.shard_params(packed, mesh, packed=True)
    e = eng.Engine(sp, cfg, eng.EngineConfig(
        num_slots=2, max_len=32, prefill_buckets=(8,), kv_quant=False))
    r = e.submit(prompt, max_new_tokens=5)
    spec.run_spec(e, draft_len=3)
    assert r.generated == r_ref.generated, (r.generated, r_ref.generated)
