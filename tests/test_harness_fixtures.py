"""Recorded-fixture tests pinning every real task's doc construction.

The reference pins request construction with 698 golden files
(lm-evaluation-harness/tests/testdata); here each task's ``convert`` runs on
checked-in raw rows (the upstream dataset schemas) and the resulting
context / choices / gold are asserted verbatim, so a prompt-format drift —
which silently shifts every accuracy number — fails CI offline."""

from mxq_tpu.eval import harness


def _doc(task_cls, row):
    docs = task_cls.convert([row])
    assert len(docs) == 1
    return docs[0]


def test_piqa_prompt_format():
    d = _doc(harness.PIQA, dict(
        goal="How do I ready a guinea pig cage for its new occupants?",
        sol1="Provide the guinea pig with a cage full of a few inches of "
             "bedding made of ripped paper strips.",
        sol2="Provide the guinea pig with a cage full of a few inches of "
             "bedding made of ripped jeans material.",
        label=0))
    # lm-eval tasks/piqa.py doc_to_text: "Question: " + goal + "\nAnswer:"
    assert d.context == ("Question: How do I ready a guinea pig cage for "
                         "its new occupants?\nAnswer:")
    assert len(d.choices) == 2 and d.choices[0].startswith("Provide")
    assert d.gold == 0


def test_winogrande_partial_context():
    d = _doc(harness.Winogrande, dict(
        sentence="John moved the couch from the garage to the backyard to "
                 "create space. The _ is small.",
        option1="garage", option2="backyard", answer="1"))
    # lm-eval tasks/winogrande.py partial_context: context is the sentence
    # up to the blank; each option is scored as option + tail
    assert d.context == ("John moved the couch from the garage to the "
                         "backyard to create space. The ")
    assert d.choices == ["garage is small.", "backyard is small."]
    assert d.gold == 0


def test_hellaswag_raw_ctx_endings():
    d = _doc(harness.HellaSwag, dict(
        ctx="A man is sitting on a roof. He",
        endings=["is using wrap to wrap a pair of skis.",
                 "is ripping level tiles off.",
                 "is holding a rubik's cube.",
                 "starts pulling up roofing on a roof."],
        label="3"))
    assert d.context == "A man is sitting on a roof. He"
    assert len(d.choices) == 4
    assert d.gold == 3


def test_arc_easy_letter_and_number_keys():
    row = dict(question="Which factor will most likely cause a person to "
                        "develop a fever?",
               choices=dict(text=["a leg muscle relaxing after exercise",
                                  "a bacterial population in the bloodstream",
                                  "several viral particles on the skin",
                                  "carbohydrates being digested in the "
                                  "stomach"],
                            label=["A", "B", "C", "D"]),
               answerKey="B")
    d = _doc(harness.ArcEasy, row)
    assert d.context == ("Question: Which factor will most likely cause a "
                         "person to develop a fever?\nAnswer:")
    assert d.gold == 1


def test_arc_challenge_numeric_answer_key():
    """Some ARC rows use numeric labels; answerKey '3' with labels
    ['1','2','3','4'] must resolve via the label list, and letter keys via
    the letter mapping (tasks/arc.py num_to_letter)."""
    row = dict(question="Q?", answerKey="3",
               choices=dict(text=["a", "b", "c", "d"],
                            label=["1", "2", "3", "4"]))
    assert _doc(harness.ArcChallenge, row).gold == 2
    row2 = dict(question="Q?", answerKey="C",
                choices=dict(text=["a", "b", "c", "d"],
                             label=["A", "B", "C", "D"]))
    assert _doc(harness.ArcChallenge, row2).gold == 2


def test_boolq_yes_no_continuations():
    d = _doc(harness.BoolQ, dict(
        passage="The Vampire Diaries, an American supernatural drama, was "
                "renewed for an eighth season.",
        question="will there be a season 8 of vampire diaries",
        label=1))
    # tasks/superglue.py:35-80: passage + "\nQuestion: " + question + "?\n
    # Answer:"; continuations " no"/" yes"
    assert d.context.endswith("?\nAnswer:")
    assert d.context.startswith("The Vampire Diaries")
    assert d.choices == ["no", "yes"]
    assert d.gold == 1


def test_siqa_three_way_one_based_label():
    d = _doc(harness.SIQA, dict(
        context="Cameron decided to have a barbecue and gathered her "
                "friends together.",
        question="How would Others feel as a result?",
        answerA="like attending", answerB="like staying home",
        answerC="a good friend to have", label="1"))
    assert d.context == ("Question: Cameron decided to have a barbecue and "
                         "gathered her friends together. How would Others "
                         "feel as a result?\nAnswer:")
    assert d.choices == ["like attending", "like staying home",
                         "a good friend to have"]
    assert d.gold == 0


def test_obqa_bare_stem_context():
    d = _doc(harness.OpenBookQA, dict(
        question_stem="The sun is responsible for",
        choices=dict(text=["puppies learning new tricks",
                           "children growing up and getting old",
                           "flowers wilting in a vase",
                           "plants sprouting, blooming and wilting"],
                     label=["A", "B", "C", "D"]),
        answerKey="D"))
    # tasks/openbookqa.py:55-65: context is the bare stem (no Question:)
    assert d.context == "The sun is responsible for"
    assert d.gold == 3


def test_mc_continuation_tokenization_protocol():
    """The evaluate() loop must score ' ' + choice.strip() — the harness's
    continuation spacing (base.py MultipleChoiceTask construct_requests)."""
    captured = []

    class LM:
        def loglikelihood(self, reqs):
            captured.extend(reqs)
            return [(float(-i), False) for i in range(len(reqs))]

    class T(harness.MultipleChoiceTask):
        name = "t"

        def docs(self):
            return [harness.MCDoc("ctx", ["a", " b "], 0)]

    def tok(s):
        import numpy as np
        return np.asarray([len(s)] + [ord(c) % 7 for c in s[:3]],
                          dtype=np.int32)

    T().evaluate(LM(), tok)
    # continuation text is " a" and " b" (strip then prepend one space)
    assert captured[0][1][0] == len(" a")
    assert captured[1][1][0] == len(" b")


def test_copa_connector_and_lowercase():
    rows = [dict(premise="The man turned on the faucet.",
                 question="effect",
                 choice1="The toilet filled with water.",
                 choice2="Water flowed from the spout.", label=1),
            dict(premise="My body cast a shadow over the grass.",
                 question="cause",
                 choice1="The sun was rising.",
                 choice2="The grass was cut.", label=0)]
    d0, d1 = harness.COPA.convert(rows)
    # tasks/superglue.py Copa: drop the period, append the connector,
    # lowercase the choices' first letter
    assert d0.context == "The man turned on the faucet therefore"
    assert d0.choices == ["the toilet filled with water.",
                          "water flowed from the spout."]
    assert d0.gold == 1
    assert d1.context == "My body cast a shadow over the grass because"
    assert d1.gold == 0


def test_rte_true_false():
    d = _doc(harness.RTE, dict(
        sentence1="No Weapons of Mass Destruction Found in Iraq Yet.",
        sentence2="Weapons of Mass Destruction Found in Iraq.",
        label=1))
    # tasks/glue.py:349-358: 0 = entailment = "True"
    assert d.context == ("No Weapons of Mass Destruction Found in Iraq "
                         "Yet.\nQuestion: Weapons of Mass Destruction "
                         "Found in Iraq. True or False?\nAnswer:")
    assert d.choices == ["True", "False"]
    assert d.gold == 1


def test_lambada_last_word_split():
    (ctx, tgt), = harness.LambadaOpenAI.convert(
        [dict(text="the little dog laughed to see such a sight")])
    # tasks/lambada.py:46-56: context = text minus last word; target is
    # " " + last word
    assert ctx == "the little dog laughed to see such a"
    assert tgt == " sight"


def test_lambada_eval_metrics():
    import jax
    from mxq_tpu.models import llama

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    lm = harness.MXQLM(params, cfg, batch_size=2)

    class T(harness.LambadaOpenAI):
        def docs(self):
            return [("some context here", " word"),
                    ("other text", " thing")]

    def tok(s):
        import numpy as np
        return np.asarray([ord(c) % cfg.vocab_size for c in s][:16],
                          dtype=np.int32)

    res = T().evaluate(lm, tok)
    assert res["n"] == 2 and res["ppl"] > 1.0 and 0.0 <= res["acc"] <= 1.0


def test_sciq_correct_answer_last():
    d = _doc(harness.SciQ, dict(
        support="Compounds are formed when two or more elements chemically "
                "combine.",
        question="What is formed when two or more elements chemically "
                 "combine?",
        distractor1="mixtures", distractor2="solutions",
        distractor3="metals", correct_answer="compounds"))
    # tasks/sciq.py: support + question prompt; the correct answer is
    # APPENDED after the 3 distractors (gold = 3)
    assert d.context.startswith("Compounds are formed")
    assert d.context.endswith("chemically combine?\nAnswer:")
    assert d.choices[3] == "compounds" and d.gold == 3


def test_sciq_empty_support_strips():
    d = _doc(harness.SciQ, dict(
        support="", question="Q?", distractor1="a", distractor2="b",
        distractor3="c", correct_answer="d"))
    # .strip() removes the leading newline when support is empty
    assert d.context == "Question: Q?\nAnswer:"


def test_swag_startphrase_and_endings():
    d = _doc(harness.SWAG, dict(
        startphrase="Members of the procession walk down the street. A "
                    "drum line",
        ending0="passes by walking down the street playing their "
                "instruments.",
        ending1="has heard approaching them.",
        ending2="arrives and they're outside dancing and asleep.",
        ending3="turns the lead singer watches the performance.",
        label=0))
    assert d.context.endswith("A drum line")
    assert len(d.choices) == 4 and d.gold == 0


def test_cb_three_way():
    d = _doc(harness.CB, dict(
        premise="It was a complex language. Not written down but handed "
                "down.",
        hypothesis="the language was written down", label=1))
    # tasks/superglue.py:113-123: True, False or Neither; 0=True, 2=Neither
    assert d.context.endswith(". True, False or Neither?\nAnswer:")
    assert d.choices == ["True", "False", "Neither"]
    assert d.gold == 1


def test_wic_word_slice():
    d = _doc(harness.WiC, dict(
        sentence1="Do you want to come over to my place later?",
        sentence2="A political system with no place for the less "
                  "prominent groups.",
        start1=31, end1=36, label=0))
    # the probed word is the start1:end1 SLICE of sentence1
    assert "the word 'place'" in d.context
    assert d.choices == ["no", "yes"] and d.gold == 0


def test_logiqa_lettered_prompt():
    d = _doc(harness.LogiQA, dict(
        context="Some students study hard.",
        question="Which is true?",
        options=["opt one", "opt two", "opt three", "opt four"],
        label="c"))
    # tasks/logiqa.py: lettered choices in the prompt, but the scored
    # continuations are the option TEXTS
    assert d.context.startswith("Passage: Some students study hard.\n")
    assert "C. opt three\n" in d.context and d.context.endswith("Answer:")
    assert d.choices == ["opt one", "opt two", "opt three", "opt four"]
    assert d.gold == 2
