"""Caption metric sanity: perfect match scores 1.0/high, disjoint scores 0."""

import pytest

from lhrs_bot_tpu.eval.caption import bleu, caption_eval, cider_d, rouge_l


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


def test_caption_eval_bundle():
    out = caption_eval(PREDS, REFS)
    for key in ("bleu1", "bleu4", "cider", "rouge_l"):
        assert key in out
