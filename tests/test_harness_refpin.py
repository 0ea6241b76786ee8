"""Cross-pinning the rebuilt harness against the REFERENCE's own request
goldens (lm-evaluation-harness/tests/testdata, 698 files).

Each ``<task>-v0-loglikelihood`` file holds sha256(json.dumps(reqs)) over
the task's full zero-shot loglikelihood request stream (strings, shuffled
doc order). Our offline fixtures (test_harness_fixtures*.py) pin formats
self-referentially; this test closes the loop by holding the rebuilt
request strings to the reference's recorded hashes — byte-for-byte.

Dataset-reachable environments run the real comparisons; offline, the
protocol machinery itself stays pinned by the synthetic-digest test.
"""

import os

import pytest

from mxq_tpu.eval import harness

REF_TESTDATA = ("/root/reference/mxq_quant/lm-evaluation-harness/tests/"
                "testdata")

# Task families whose reference class is a VANILLA MultipleChoiceTask (no
# construct_requests override -> one (doc_to_text, " " + choice) request
# per choice), so reference_loglikelihood_requests models them exactly.
VANILLA_MC = (["piqa", "hellaswag", "arc_easy", "arc_challenge",
               "openbookqa", "sciq", "logiqa", "mathqa", "headqa",
               "headqa_en", "headqa_es", "prost", "swag", "toxigen",
               "qa4mre_2011", "qa4mre_2012", "qa4mre_2013"]
              + [f"hendrycksTest-{s}" for s in harness.MMLU_SUBJECTS])


def test_hash_protocol_pinned():
    """The hashing construction itself (json list-of-tuples + sha256) is
    frozen against a hand-computed digest, so a serialization change can
    never silently invalidate the networked comparisons."""
    reqs = [("Question: why?\nAnswer:", " because"),
            ("Question: why?\nAnswer:", " why not")]
    # sha256(json.dumps([["Question: why?\nAnswer:", " because"],
    #                    ["Question: why?\nAnswer:", " why not"]],
    #                   sort_keys=True)) computed independently
    assert harness.reference_request_hash(reqs) == (
        "88334c627aafad8d76b978b2aba45d705f63d68b0345ee1ea6a0c56ae091a490")


def test_shuffle_order_is_reference_exact():
    """random.Random(42).shuffle over the doc list is the reference
    evaluator's only ordering step (evaluator.py:214-217); pin the
    permutation for a known length so a seeding/ordering change fails
    loudly offline."""
    import random
    idx = list(range(10))
    rnd = random.Random()
    rnd.seed(42)
    rnd.shuffle(idx)
    assert idx == [7, 3, 2, 8, 5, 6, 9, 4, 0, 1]

    class T(harness.MultipleChoiceTask):
        name = "fake"

        def docs(self):
            return [harness.MCDoc(f"ctx{i}", [f"a{i}", f"b{i}"], 0)
                    for i in range(10)]

    reqs = harness.reference_loglikelihood_requests(T())
    assert reqs[0] == ("ctx7", " a7")
    assert reqs[1] == ("ctx7", " b7")
    assert reqs[-1] == ("ctx1", " b1")
    assert len(reqs) == 20


@pytest.mark.slow
@pytest.mark.parametrize("name", VANILLA_MC)
def test_request_hash_matches_reference_testdata(name):
    """Rebuilt request stream == the reference's recorded per-task hash.
    Needs the task's dataset (networked tier); offline it skips."""
    fname = os.path.join(REF_TESTDATA, f"{name}-v0-loglikelihood")
    if not os.path.exists(fname):
        pytest.skip(f"no reference testdata for {name}")
    task = harness.all_tasks()[name]
    try:
        reqs = harness.reference_loglikelihood_requests(task)
    except RuntimeError as e:
        pytest.skip(f"dataset unavailable: {e}")
    with open(fname) as fh:
        expected = fh.read().strip()
    got = harness.reference_request_hash(reqs)
    assert got == expected, (
        f"{name}: request stream diverges from the reference "
        f"(got {got[:16]}..., recorded {expected[:16]}...); "
        f"first request: {reqs[0]!r}")
