"""QAT tests: KD loss semantics, training reduces loss, checkpoint
save/resume, data utilities, data synthesis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mxq_tpu.models import llama
from mxq_tpu.qat import train, loop, data as qdata

CFG = llama.LlamaConfig.tiny(w_bits=2)
TEACHER_CFG = llama.LlamaConfig.tiny()


def test_kd_loss_zero_when_identical():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    mask = jnp.ones((2, 4))
    l = train.kd_loss_fn(logits, logits, mask)
    assert abs(float(l)) < 1e-6


def test_kd_loss_positive_and_scaled():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    mask = jnp.ones((2, 4))
    l1 = float(train.kd_loss_fn(a, b, mask, scale=1.0))
    l2 = float(train.kd_loss_fn(a, b, mask, scale=2.0))
    assert l1 > 0
    np.testing.assert_allclose(l2, 2 * l1, rtol=1e-6)


def test_training_reduces_ce_loss():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tc = train.TrainConfig(learning_rate=1e-3, use_kd=False, total_steps=30,
                           remat=False)
    opt = train.make_optimizer(tc)
    opt_state = opt.init(params)
    step = jax.jit(train.make_train_step(CFG, tc, opt))
    batch = {"input_ids": jnp.tile(jnp.arange(32)[None], (2, 1))}
    losses = []
    for _ in range(15):
        params, opt_state, m = step(params, None, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_kd_training_step_runs():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    teacher = llama.init_params(TEACHER_CFG, jax.random.PRNGKey(1))
    tc = train.TrainConfig(use_kd=True, total_steps=10)
    opt = train.make_optimizer(tc)
    opt_state = opt.init(params)
    step = jax.jit(train.make_train_step(CFG, tc, opt))
    batch = {"input_ids": jnp.ones((2, 16), jnp.int32)}
    params, opt_state, m = step(params, teacher, opt_state, batch)
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_save_resume(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tc = train.TrainConfig(use_kd=False, total_steps=10, remat=False)
    lc = loop.LoopConfig(output_dir=str(tmp_path / "ckpt"), save_steps=2,
                         log_steps=100, max_steps=4)
    batch = {"input_ids": jnp.ones((2, 16), jnp.int32)}
    data = iter([batch] * 10)
    res = loop.run_training(params, None, CFG, tc, lc, data)
    assert res["last_step"] >= 4
    # resume: starts from saved step
    logs = []
    res2 = loop.run_training(params, None, CFG, tc,
                             loop.LoopConfig(output_dir=str(tmp_path / "ckpt"),
                                             save_steps=2, log_steps=100,
                                             max_steps=6),
                             iter([batch] * 10), log=logs.append)
    assert any("resumed" in str(l) for l in logs)


def test_chunked_dataset():
    streams = [np.arange(100), np.arange(57)]
    d = qdata.chunked_dataset(streams, block_size=32)
    assert d.shape == (4, 32)
    np.testing.assert_array_equal(d[0], np.arange(32))


def test_synthesize_corpus():
    params = llama.init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    seeds = np.asarray([3, 5], np.int32)
    out = qdata.synthesize_corpus(params, TEACHER_CFG, seeds, length=12)
    assert out.shape == (2, 12)
    assert (out[:, 0] == seeds).all()
    assert out.min() >= 0 and out.max() < TEACHER_CFG.vocab_size


def test_merge_chunks(tmp_path):
    for i in range(3):
        qdata.write_jsonl_chunk(str(tmp_path / f"gen.chunk.{i:02d}.jsonl"),
                                np.arange(6).reshape(2, 3))
    n = qdata.merge_chunks(str(tmp_path), str(tmp_path / "all_gen.jsonl"))
    assert n == 6
    texts = qdata.read_jsonl_texts(str(tmp_path / "all_gen.jsonl"))
    assert len(texts) == 6


def test_metrics_backends_write(tmp_path):
    """The loop's metrics writer produces BOTH TensorBoard event files and
    a greppable metrics.jsonl (run_train.sh:30 --report_to tensorboard
    analogue)."""
    import glob
    import json as _json

    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tc = train.TrainConfig(use_kd=False, total_steps=6, remat=False)
    lc = loop.LoopConfig(output_dir=str(tmp_path / "ckpt"), save_steps=10,
                         log_steps=2, max_steps=4)
    batch = {"input_ids": jnp.ones((2, 16), jnp.int32)}
    loop.run_training(params, None, CFG, tc, lc, iter([batch] * 6),
                      val_batches=[batch])
    logdir = tmp_path / "ckpt" / "logs"
    recs = [_json.loads(l) for l in open(logdir / "metrics.jsonl")]
    tags = set().union(*(set(r) for r in recs))
    assert "train/loss" in tags and "eval/ppl" in tags
    assert sorted(r["step"] for r in recs if "train/loss" in r) == [2, 4]
    assert glob.glob(str(logdir / "events.out.tfevents.*"))
