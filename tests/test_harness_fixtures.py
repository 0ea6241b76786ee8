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


def test_hellaswag_process_doc():
    """Reference _process_doc semantics (tasks/hellaswag.py): query =
    preprocess(activity_label + ': ' + ctx_a + ' ' + ctx_b.capitalize()),
    choices preprocessed (strip / [title] -> '. ' / bracket removal /
    double-space collapse)."""
    d = _doc(harness.HellaSwag, dict(
        activity_label="Roof shingle removal",
        ctx_a="A man is sitting on a roof.",
        ctx_b="he",
        endings=["is using wrap to wrap a pair of skis.",
                 " is ripping level tiles off. ",
                 "is holding a rubik's cube.",
                 "starts pulling up roofing on a roof."],
        label="3"))
    assert d.context == ("Roof shingle removal: A man is sitting on a "
                         "roof. He")
    assert d.choices[1] == "is ripping level tiles off."   # stripped
    assert d.gold == 3


def test_hellaswag_preprocess_wikihow_artifacts():
    # " [title]" -> ". "; "[header]" deleted (leaving its following space —
    # strip ran FIRST, exactly as the reference orders the steps)
    assert (harness.HellaSwag.preprocess(
        "[header] Clean the sink. [title] Use soap.") ==
        " Clean the sink.. Use soap.")
    assert harness.HellaSwag.preprocess("  padded  ") == "padded"


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
    """The evaluate() loop must score ' ' + choice with NO strip — the
    reference's exact continuation spacing (base.py:609
    `" {}".format(choice)`); a choice with stray whitespace keeps it."""
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
    # continuation text is " " + choice verbatim: " a" and "  b "
    assert captured[0][1][0] == len(" a")
    assert captured[1][1][0] == len("  b ")


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


def test_mmlu_lettered_prompt_text_continuations():
    d = _doc(harness.MMLU("anatomy"), dict(
        question="Which of these branches of the trigeminal nerve contain "
                 "somatic motor processes?",
        choices=["The supraorbital nerve", "The infraorbital nerve",
                 "The mental nerve", "None of the above"],
        answer=3))
    # tasks/hendrycks_test.py:129-154: lettered prompt, TEXT continuations
    assert d.context.startswith("Question: Which of these branches")
    assert "\nChoices:\nA. The supraorbital nerve\n" in d.context
    assert d.context.endswith("D. None of the above\nAnswer:")
    assert d.choices[0] == "The supraorbital nerve" and d.gold == 3


def test_mmlu_letter_answer_and_registry():
    d = _doc(harness.MMLU("world_religions"), dict(
        question="Q?", choices=["w", "x", "y", "z"], answer="B"))
    assert d.gold == 1
    assert len([n for n in harness.TASKS if n.startswith("hendrycksTest-")]
               ) == 57


def test_race_collates_by_article():
    rows = [
        dict(article="The sun is a star.",
             question="What is the sun?",
             options=["A star", "A planet", "A moon", "A comet"],
             answer="A"),
        dict(article="The sun is a star.",
             question="What orbits the sun?",
             options=["Planets", "Stars", "Galaxies", "Nothing"],
             answer="A"),
    ]
    docs = harness.RACE.convert(rows)
    # one doc per ARTICLE (race.py:64-84), earlier questions answered inline
    assert len(docs) == 1
    d = docs[0]
    assert d.context.startswith("Article: The sun is a star.\n\n")
    assert "Question: What is the sun?\nAnswer: A star\n" in d.context
    assert d.context.endswith("What orbits the sun?")
    assert d.choices == ["Planets", "Stars", "Galaxies", "Nothing"]
    assert d.gold == 0


def test_mathqa_option_regex():
    d = _doc(harness.MathQA, dict(
        Problem="the banker ' s gain of a certain sum due 3 years hence at "
                "10 % per annum is rs . 36 . what is the present worth ?",
        options="a ) rs . 400 , b ) rs . 300 , c ) rs . 500 , d ) rs . 350 "
                ", e ) none of these",
        correct="a"))
    assert d.context == ("Question: the banker ' s gain of a certain sum "
                         "due 3 years hence at 10 % per annum is rs . 36 . "
                         "what is the present worth ?\nAnswer:")
    assert d.choices == ["rs . 400", "rs . 300", "rs . 500", "rs . 350",
                         "none of these"]
    assert d.gold == 0


def test_pubmedqa_abstract_and_decision():
    d = _doc(harness.PubMedQA, dict(
        question="Do mitochondria play a role in apoptosis?",
        context=dict(contexts=["Context one.", "Context two."]),
        final_decision="yes"))
    assert d.context == ("Abstract: Context one.\nContext two.\n"
                         "Question: Do mitochondria play a role in "
                         "apoptosis?\nAnswer:")
    assert d.choices == ["yes", "no", "maybe"] and d.gold == 0


def test_anli_label_order():
    d = _doc(harness.ANLI(1), dict(
        premise="The cat sat on the mat.",
        hypothesis="An animal was on the mat", label=0))
    # tasks/anli.py:62-84 — question appended with no newline; 0=True
    assert d.context == ("The cat sat on the mat.\nQuestion: An animal was "
                         "on the mat True, False, or Neither?\nAnswer:")
    assert d.choices == ["True", "Neither", "False"] and d.gold == 0


def test_mnli_trailing_period():
    d = _doc(harness.MNLI, dict(
        premise="The new rights are nice enough",
        hypothesis="Everyone really likes the newest benefits ", label=1))
    # glue.py:180-192: hypothesis stripped + period appended if missing
    assert d.context == ("The new rights are nice enough\nQuestion: "
                         "Everyone really likes the newest benefits. True, "
                         "False or Neither?\nAnswer:")
    assert d.choices == ["True", "Neither", "False"] and d.gold == 1


def test_qnli_yes_no():
    d = _doc(harness.QNLI, dict(
        question="What came into force after the new constitution was "
                 "herald?",
        sentence="As of that day, the new constitution heralding the "
                 "Second Republic came into force.",
        label=0))
    assert d.context.endswith(
        "\nQuestion: Does this response answer the question?\nAnswer:")
    assert d.choices == ["yes", "no"] and d.gold == 0


def test_qqp_and_mrpc_and_wnli_formats():
    d = _doc(harness.QQP, dict(question1="How do I read faster?",
                               question2="How can I read more quickly?",
                               label=1))
    assert d.context.startswith("Question 1: How do I read faster?\n"
                                "Question 2: How can I read more quickly?")
    assert d.choices == ["no", "yes"] and d.gold == 1
    d = _doc(harness.MRPC, dict(
        sentence1="He said the food is n't fresh .",
        sentence2='She replied , " it is fresh " .', label=0))
    # general_detokenize fixes PTB spacing (utils.py:62-69)
    assert "He said the food isn't fresh." in d.context
    assert d.choices == ["no", "yes"] and d.gold == 0
    d = _doc(harness.WNLI, dict(sentence1="A.", sentence2="B.", label=1))
    assert d.choices == ["False", "True"] and d.gold == 1


def test_sst_cola_formats():
    d = _doc(harness.SST, dict(sentence="it 's a charming journey .",
                               label=1))
    assert d.context == ("it's a charming journey.\nQuestion: Is this "
                         "sentence positive or negative?\nAnswer:")
    assert d.choices == ["negative", "positive"] and d.gold == 1
    d = _doc(harness.CoLA, dict(sentence="The book was written by John.",
                                label=1))
    assert d.context == ("The book was written by John.\nQuestion: Does "
                         "this sentence make sense?\nAnswer:")
    assert d.choices == ["no", "yes"] and d.gold == 1


def test_wsc273_partial_context_fixed_target():
    rows = [dict(
        text="The city councilmen refused the demonstrators a permit "
             "because they feared violence.",
        pronoun="they", pronoun_loc=63,
        options=["The city councilmen", "The demonstrators"], label=0)]
    docs = harness.WSC273.convert(rows)
    ctxs, target, gold = docs[0]
    # tasks/wsc273.py:96-118: context varies per option (pronoun replaced,
    # capitalized option lowercased mid-sentence), target is the tail
    assert ctxs[0].endswith("because the city councilmen")
    assert ctxs[1].endswith("because the demonstrators")
    assert target == " feared violence."
    assert gold == 0


def test_truthfulqa_qa_prompt_and_splits():
    rows = [dict(
        question="What is the smallest country in the world?",
        mc1_targets=dict(
            choices=["Vatican City is the smallest country.",
                     "Monaco is the smallest country."],
            labels=[1, 0]),
        mc2_targets=dict(
            choices=["Vatican City.", "The Vatican.", "Monaco."],
            labels=[1, 1, 0]))]
    docs = harness.TruthfulQAMC.convert(rows)
    ctx, mc1, mc2, split = docs[0]
    assert ctx.startswith("Q: What is human life expectancy")
    assert ctx.endswith("Q: What is the smallest country in the world?\nA:")
    assert mc1[0].startswith("Vatican City") and split == 2
