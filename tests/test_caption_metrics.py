"""Caption metric sanity: perfect match scores 1.0/high, disjoint scores 0."""

import pytest

from lhrs_bot_tpu.eval.caption import (
    _porter_stem, bleu, caption_eval, cider_d, meteor, rouge_l)


PREDS = ["a river runs through green fields",
         "an airport with two runways"]
REFS = [["a river runs through green fields",
         "the river crosses green farmland"],
        ["an airport with two runways", "airport with runways"]]


class TestBleu:
    def test_perfect_match(self):
        out = bleu(PREDS, REFS)
        assert out["bleu4"] == pytest.approx(1.0)

    def test_disjoint_is_zero(self):
        out = bleu(["completely different words"],
                   [["nothing matches here at all"]])
        assert out["bleu4"] < 1e-6

    def test_partial_between(self):
        out = bleu(["a river runs through dry sand"],
                   [["a river runs through green fields"]])
        assert 0.0 < out["bleu4"] < 1.0


class TestCider:
    def test_match_beats_mismatch(self):
        good = cider_d(PREDS, REFS)
        bad = cider_d(["unrelated text", "other words"], REFS)
        assert good > bad >= 0.0

    def test_scale(self):
        assert cider_d(PREDS, REFS) <= 10.0


class TestRouge:
    def test_perfect_and_zero(self):
        assert rouge_l(["a b c"], [["a b c"]]) == pytest.approx(1.0)
        assert rouge_l(["x y z"], [["a b c"]]) == 0.0


class TestPorterStemmer:
    def test_golden_stems(self):
        # classic Porter (1980) paper examples
        golden = {
            "caresses": "caress", "ponies": "poni", "ties": "ti",
            "caress": "caress", "cats": "cat", "feed": "feed",
            "agreed": "agre", "plastered": "plaster", "bled": "bled",
            "motoring": "motor", "sing": "sing", "conflated": "conflat",
            "troubled": "troubl", "sized": "size", "hopping": "hop",
            "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
            "failing": "fail", "filing": "file", "happy": "happi",
            "sky": "sky", "relational": "relat", "conditional": "condit",
            "rational": "ration", "valenci": "valenc", "digitizer": "digit",
            "operator": "oper", "feudalism": "feudal",
            "hopefulness": "hope", "callousness": "callous",
            "formaliti": "formal", "formative": "form",
            "formalize": "formal", "electriciti": "electr",
            "electrical": "electr", "hopeful": "hope", "goodness": "good",
            "revival": "reviv", "allowance": "allow", "inference": "infer",
            "airliner": "airlin", "adjustable": "adjust",
            "defensible": "defens", "irritant": "irrit",
            "replacement": "replac", "adjustment": "adjust",
            "dependent": "depend", "adoption": "adopt", "homologou":
            "homolog", "communism": "commun", "activate": "activ",
            "angulariti": "angular", "homologous": "homolog",
            "effective": "effect", "bowdlerize": "bowdler",
            "probate": "probat", "rate": "rate", "cease": "ceas",
            "controll": "control", "roll": "roll",
        }
        for word, stem in golden.items():
            assert _porter_stem(word) == stem, word

    def test_stability(self):
        # stemming a stem is idempotent for typical words
        for w in ("running", "flies", "generously"):
            s = _porter_stem(w)
            assert _porter_stem(s) == s


class TestMeteor:
    def test_perfect_match_near_one(self):
        # single chunk → penalty 0.5·(1/m)³, tiny for long sentences
        s = meteor(["a river runs through green fields"],
                   [["a river runs through green fields"]])
        assert s > 0.99

    def test_disjoint_is_zero(self):
        assert meteor(["x y z"], [["a b c"]]) == 0.0

    def test_stem_matching_counts(self):
        # "running"/"runs" only match through the stem stage
        with_stem = meteor(["the dog running fast"],
                           [["the dog runs fast"]])
        no_overlap = meteor(["the dog walked slow"],
                            [["a cat sat still"]])
        assert with_stem > 0.5 > no_overlap

    def test_word_order_penalized(self):
        ordered = meteor(["a b c d e f"], [["a b c d e f"]])
        shuffled = meteor(["f e d c b a"], [["a b c d e f"]])
        assert ordered > shuffled > 0.0

    def test_best_reference_taken(self):
        multi = meteor(["a river runs"],
                       [["unrelated words here", "a river runs"]])
        single = meteor(["a river runs"], [["unrelated words here"]])
        assert multi > single


def test_caption_eval_bundle():
    out = caption_eval(PREDS, REFS)
    for key in ("bleu1", "bleu4", "cider", "rouge_l", "meteor"):
        assert key in out
