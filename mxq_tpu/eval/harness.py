"""Task-eval harness — the counterpart of the reference's vendored
lm-evaluation-harness v0.3.0 + lmeval.py driver (mxq_quant/lmeval.py:45-138).

Rather than vendoring 13.5k lines, this implements the harness CORE the
reference actually uses for its headline tasks — loglikelihood-scored
multiple choice (winogrande/piqa/hellaswag/arc_easy, README.md:26-34) — and
exposes an adapter for an externally-installed lm-eval when present.

Protocol (mirrors base.py:172 loglikelihood + MultipleChoiceTask:604):
  * a request is (context tokens, continuation tokens)
  * score = sum of log p(continuation | context) under the model
  * accuracy: argmax over choices == gold; acc_norm: byte-length normalized
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama


# ---------------------------------------------------------------------------
# LM adapter
# ---------------------------------------------------------------------------


class MXQLM:
    """Batched loglikelihood scorer over an mxq_tpu model (the analogue of
    lm_eval's AutoCausalLM, huggingface.py:378-420)."""

    def __init__(self, params, cfg: llama.LlamaConfig, batch_size: int = 8,
                 max_len: int = 2048):
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_len = max_len
        self._score = jax.jit(self._score_impl, static_argnames=())

    def _score_impl(self, ids, cont_mask):
        """ids [B, T] RIGHT-padded; cont_mask [B, T] marks continuation
        positions. Returns (sum logp over continuation, exact-match flag).

        Right padding (sequence at the start, zeros after) matches the
        reference's vendored lm-eval v0.3.0 protocol (base.py:270-281): under
        the causal mask no real token can attend a pad (pads only come
        later), and RoPE positions start at 0 — so pads never influence
        scores and no attention mask is needed."""
        logits, _ = llama.forward(self.params, ids, self.cfg)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        m = cont_mask[:, 1:].astype(jnp.float32)
        s = jnp.sum(tok_lp * m, axis=1)
        greedy = (jnp.argmax(logp, -1) == tgt) | (m == 0)
        exact = jnp.all(greedy, axis=1)
        return s, exact

    def loglikelihood(self, requests: Sequence[tuple[np.ndarray, np.ndarray]]
                      ) -> list[tuple[float, bool]]:
        """requests: list of (context_tokens, continuation_tokens)."""
        out: list[tuple[float, bool]] = []
        bs = self.batch_size
        # bucket to one padded length per batch for stable compiles
        t_pad = 1
        for c, g in requests:
            t_pad = max(t_pad, len(c) + len(g))
        t_pad = min(_round_pow2(t_pad), self.max_len)

        for i in range(0, len(requests), bs):
            chunk = requests[i:i + bs]
            ids = np.zeros((bs, t_pad), np.int32)
            mask = np.zeros((bs, t_pad), np.int32)
            for j, (ctx, cont) in enumerate(chunk):
                seq = np.concatenate([ctx, cont])[-t_pad:]
                n_cont = min(len(cont), len(seq))
                ids[j, : len(seq)] = seq
                mask[j, len(seq) - n_cont: len(seq)] = 1
            s, exact = self._score(jnp.asarray(ids), jnp.asarray(mask))
            for j in range(len(chunk)):
                out.append((float(s[j]), bool(exact[j])))
        return out


def _round_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Tasks
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MCDoc:
    context: str
    choices: list[str]
    gold: int


class MultipleChoiceTask:
    """Accuracy + byte-normalized accuracy over loglikelihood-scored choices
    (lm-evaluation-harness base.py:604-637 semantics)."""

    name = "mc_task"

    def docs(self) -> Iterable[MCDoc]:
        raise NotImplementedError

    def evaluate(self, lm: MXQLM, tokenize: Callable[[str], np.ndarray],
                 limit: Optional[int] = None) -> dict:
        docs = list(self.docs())
        if limit:
            docs = docs[:limit]
        reqs, spans = [], []
        for d in docs:
            start = len(reqs)
            for ch in d.choices:
                reqs.append((tokenize(d.context), tokenize(" " + ch.strip())))
            spans.append((start, len(reqs), d))
        scores = lm.loglikelihood(reqs)
        acc = accn = 0
        for start, end, d in spans:
            lls = [scores[k][0] for k in range(start, end)]
            lens = [max(len(c) + 1, 1) for c in d.choices]
            pick = int(np.argmax(lls))
            pickn = int(np.argmax([l / n for l, n in zip(lls, lens)]))
            acc += pick == d.gold
            accn += pickn == d.gold
        n = max(len(spans), 1)
        return {"task": self.name, "acc": acc / n, "acc_norm": accn / n,
                "n": n}


def _hf_docs(loader):
    try:
        return loader()
    except Exception:
        return None


class PIQA(MultipleChoiceTask):
    name = "piqa"

    def docs(self):
        def load():
            from datasets import load_dataset
            ds = load_dataset("piqa", split="validation")
            return [MCDoc(f"Question: {d['goal']}\nAnswer:",
                          [d["sol1"], d["sol2"]], d["label"]) for d in ds]
        return _hf_docs(load) or []


class Winogrande(MultipleChoiceTask):
    name = "winogrande"

    def docs(self):
        def load():
            from datasets import load_dataset
            ds = load_dataset("winogrande", "winogrande_xl",
                             split="validation")
            out = []
            for d in ds:
                idx = d["sentence"].index("_")
                ctx = d["sentence"][:idx]
                tail = d["sentence"][idx + 1:]
                out.append(MCDoc(ctx, [d["option1"] + tail,
                                       d["option2"] + tail],
                                 int(d["answer"]) - 1))
            return out
        return _hf_docs(load) or []


class HellaSwag(MultipleChoiceTask):
    name = "hellaswag"

    def docs(self):
        def load():
            from datasets import load_dataset
            ds = load_dataset("hellaswag", split="validation")
            return [MCDoc(d["ctx"], d["endings"], int(d["label"]))
                    for d in ds]
        return _hf_docs(load) or []


class ArcEasy(MultipleChoiceTask):
    name = "arc_easy"

    def docs(self):
        def load():
            from datasets import load_dataset
            ds = load_dataset("ai2_arc", "ARC-Easy", split="validation")
            out = []
            for d in ds:
                gold = d["choices"]["label"].index(d["answerKey"])
                out.append(MCDoc(f"Question: {d['question']}\nAnswer:",
                                 d["choices"]["text"], gold))
            return out
        return _hf_docs(load) or []


TASKS = {t.name: t for t in (PIQA(), Winogrande(), HellaSwag(), ArcEasy())}


def evaluate(lm: MXQLM, tokenize, task_names: Sequence[str],
             limit: Optional[int] = None) -> list[dict]:
    """Run the named tasks (evaluator.simple_evaluate analogue,
    evaluator.py:21-138)."""
    results = []
    for name in task_names:
        task = TASKS[name]
        res = task.evaluate(lm, tokenize, limit)
        results.append(res)
    return results


# ---------------------------------------------------------------------------
# External lm-eval integration (when installed)
# ---------------------------------------------------------------------------


def make_lm_eval_model(params, cfg: llama.LlamaConfig, tokenizer,
                       batch_size: int = 8):
    """Wrap our model as an ``lm_eval.api.model.LM`` subclass if lm-eval is
    installed (pip package ``lm-eval``); raises ImportError otherwise."""
    from lm_eval.api.model import LM  # type: ignore

    inner = MXQLM(params, cfg, batch_size)

    class _Wrapped(LM):
        def loglikelihood(self, requests):
            reqs = []
            for r in requests:
                ctx, cont = r.args
                reqs.append((np.asarray(tokenizer(ctx)["input_ids"]),
                             np.asarray(tokenizer(cont)["input_ids"])))
            return inner.loglikelihood(reqs)

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

        def generate_until(self, requests):
            raise NotImplementedError

    return _Wrapped()
