"""Harness tests with a synthetic task + toy 'tokenizer' (the reference's
strategy: DummyLM + deterministic golden results, lm-evaluation-harness
tests/test_evaluator.py:14)."""

import numpy as np
import jax

from mxq_tpu.models import llama
from mxq_tpu.eval import harness

CFG = llama.LlamaConfig.tiny()


def toy_tokenize(text: str) -> np.ndarray:
    return np.asarray([(ord(c) % CFG.vocab_size) for c in text][:64],
                      dtype=np.int32)


class SynthTask(harness.MultipleChoiceTask):
    name = "synth"

    def docs(self):
        rng = np.random.RandomState(0)
        for i in range(8):
            yield harness.MCDoc(context=f"context number {i}:",
                                choices=["alpha", "beta", "gamma"],
                                gold=int(rng.randint(3)))


def test_loglikelihood_ordering():
    """Longer continuations must accumulate more (negative) logprob mass, and
    identical requests must score identically."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    lm = harness.MXQLM(params, CFG, batch_size=4)
    ctx = toy_tokenize("hello world")
    a = toy_tokenize(" x")
    b = toy_tokenize(" x and more tokens")
    (sa, _), (sb, _), (sa2, _) = lm.loglikelihood([(ctx, a), (ctx, b), (ctx, a)])
    assert sa == sa2
    assert sb < sa  # more tokens, more mass


def test_mc_task_runs_and_scores():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    lm = harness.MXQLM(params, CFG, batch_size=4)
    res = SynthTask().evaluate(lm, toy_tokenize)
    assert res["n"] == 8
    assert 0.0 <= res["acc"] <= 1.0 and 0.0 <= res["acc_norm"] <= 1.0


def test_deterministic_golden():
    """Scores are deterministic across runs (golden-style pinning)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    lm = harness.MXQLM(params, CFG, batch_size=4)
    r1 = SynthTask().evaluate(lm, toy_tokenize)
    r2 = SynthTask().evaluate(lm, toy_tokenize)
    assert r1 == r2


def test_registered_tasks_exist():
    assert set(harness.TASKS) == {"piqa", "winogrande", "hellaswag",
                                  "arc_easy"}


def test_right_padding_invariance():
    """Scores must not depend on how much padding a batch carries: with
    right-padding + causal masking (the lm-eval v0.3.0 protocol), batching a
    short request next to a long one leaves its score unchanged (ADVICE r1:
    the old left-pad scheme shifted RoPE positions and attended pads)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    lm = harness.MXQLM(params, CFG, batch_size=4)
    ctx = toy_tokenize("hello world")
    cont = toy_tokenize(" xy")
    long_ctx = toy_tokenize("a much longer context string here padding out")
    (alone, _), = lm.loglikelihood([(ctx, cont)])
    (batched, _), _ = lm.loglikelihood([(ctx, cont), (long_ctx, cont)])
    np.testing.assert_allclose(alone, batched, rtol=1e-4)
