"""Caption evaluation metrics: BLEU-1..4, CIDEr-D, ROUGE-L.

Capability parity with the reference's COCO caption eval path
(hook/eval_hook.py:21-187 uses pycocoevalcap BLEU/CIDEr/...). Implemented
from the standard definitions so the heavy pycoco dependency isn't needed:
  * BLEU with brevity penalty (Papineni et al. 2002, corpus-level);
  * CIDEr-D (Vedantam et al. 2015): TF-IDF-weighted n-gram cosine with
    length gaussian penalty, n = 1..4, corpus IDF;
  * ROUGE-L (Lin 2004): LCS-based F-measure with beta = 1.2.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def _tokenize(text: str) -> List[str]:
    return text.lower().replace(".", " ").replace(",", " ").split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(
    predictions: Sequence[str],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
) -> Dict[str, float]:
    """Corpus BLEU-1..max_n. references: per-sample list of gold captions."""
    clipped = [0] * max_n
    totals = [0] * max_n
    pred_len = 0
    ref_len = 0
    for pred, refs in zip(predictions, references):
        p_tok = _tokenize(pred)
        r_toks = [_tokenize(r) for r in refs]
        pred_len += len(p_tok)
        # closest reference length
        ref_len += min((abs(len(r) - len(p_tok)), len(r))
                       for r in r_toks)[1]
        for n in range(1, max_n + 1):
            p_ng = _ngrams(p_tok, n)
            max_ref = Counter()
            for r in r_toks:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            totals[n - 1] += max(sum(p_ng.values()), 0)
            clipped[n - 1] += sum(min(c, max_ref[ng])
                                  for ng, c in p_ng.items())
    bp = 1.0 if pred_len > ref_len else math.exp(
        1 - ref_len / max(pred_len, 1))
    out = {}
    log_sum = 0.0
    for n in range(1, max_n + 1):
        p = clipped[n - 1] / max(totals[n - 1], 1)
        log_sum += math.log(max(p, 1e-12))
        out[f"bleu{n}"] = bp * math.exp(log_sum / n)
    return out


def cider_d(
    predictions: Sequence[str],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """CIDEr-D over the corpus (IDF computed from the reference set)."""
    # document frequency over reference "documents" (one doc per image)
    doc_freq: List[Counter] = [Counter() for _ in range(max_n)]
    num_docs = len(references)
    ref_ngrams = []
    for refs in references:
        per_img = []
        seen = [set() for _ in range(max_n)]
        for r in refs:
            toks = _tokenize(r)
            per_n = [_ngrams(toks, n + 1) for n in range(max_n)]
            per_img.append((per_n, len(toks)))
            for n in range(max_n):
                seen[n].update(per_n[n].keys())
        for n in range(max_n):
            for ng in seen[n]:
                doc_freq[n][ng] += 1
        ref_ngrams.append(per_img)

    def tfidf_vec(counts: Counter, n: int) -> Dict:
        total = max(sum(counts.values()), 1)
        vec = {}
        for ng, c in counts.items():
            df = max(doc_freq[n][ng], 1)
            idf = math.log(max(num_docs, 1)) - math.log(df)
            vec[ng] = (c / total) * idf
        return vec

    def cosine(v1: Dict, v2: Dict, len1: int, len2: int) -> float:
        norm1 = math.sqrt(sum(x * x for x in v1.values()))
        norm2 = math.sqrt(sum(x * x for x in v2.values()))
        if norm1 == 0 or norm2 == 0:
            return 0.0
        # CIDEr-D clips candidate counts to the reference's
        num = sum(min(v1.get(ng, 0.0), v2.get(ng, 0.0)) * v2.get(ng, 0.0)
                  for ng in v1)
        delta = len1 - len2
        penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
        return penalty * num / (norm1 * norm2)

    scores = []
    for pred, per_img in zip(predictions, ref_ngrams):
        p_tok = _tokenize(pred)
        p_vecs = [tfidf_vec(_ngrams(p_tok, n + 1), n) for n in range(max_n)]
        score_n = [0.0] * max_n
        for (r_counts, r_len) in per_img:
            for n in range(max_n):
                r_vec = tfidf_vec(r_counts[n], n)
                score_n[n] += cosine(p_vecs[n], r_vec, len(p_tok), r_len)
        k = max(len(per_img), 1)
        scores.append(10.0 * sum(s / k for s in score_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def rouge_l(
    predictions: Sequence[str],
    references: Sequence[Sequence[str]],
    beta: float = 1.2,
) -> float:
    def lcs(a: List[str], b: List[str]) -> int:
        dp = [0] * (len(b) + 1)
        for x in a:
            prev = 0
            for j, y in enumerate(b, 1):
                cur = dp[j]
                dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
                prev = cur
        return dp[-1]

    scores = []
    for pred, refs in zip(predictions, references):
        p = _tokenize(pred)
        best = 0.0
        for r in refs:
            rt = _tokenize(r)
            l = lcs(p, rt)
            prec = l / max(len(p), 1)
            rec = l / max(len(rt), 1)
            if prec and rec:
                f = ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
                best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def caption_eval(predictions: Sequence[str],
                 references: Sequence[Sequence[str]]) -> Dict[str, float]:
    out = bleu(predictions, references)
    out["cider"] = cider_d(predictions, references)
    out["rouge_l"] = rouge_l(predictions, references)
    return out
