"""Deterministic word-level tokenizer exposing the HF surface the data layer
needs: __call__(text).input_ids (BOS-prefixed), decode, bos/eos/pad ids,
model_max_length. Vocabulary is hash-based so any text tokenizes stably."""

from __future__ import annotations

import re
from types import SimpleNamespace
from typing import List


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    unk_token_id = 3
    model_max_length = 512
    _RESERVED = 8

    def __init__(self, vocab_size: int = 2000):
        self.vocab_size = vocab_size
        self._id_to_str = {}

    def _piece_ids(self, text: str) -> List[int]:
        ids = []
        # parse <s>/</s> specials regardless of adjacent whitespace, like
        # the real LLaMA tokenizer does
        for segment in re.split(r"(<s>|</s>)", text):
            if segment == "<s>":
                ids.append(self.bos_token_id)
            elif segment == "</s>":
                ids.append(self.eos_token_id)
            else:
                for p in re.findall(r"\S+|\n", segment):
                    tid = self._RESERVED + (
                        hash(p) % (self.vocab_size - self._RESERVED))
                    self._id_to_str[tid] = p
                    ids.append(tid)
        return ids

    def __call__(self, text, **kw):
        if isinstance(text, list):
            return SimpleNamespace(
                input_ids=[[self.bos_token_id] + self._piece_ids(t)
                           for t in text])
        return SimpleNamespace(
            input_ids=[self.bos_token_id] + self._piece_ids(text))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        words = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (
                    self.bos_token_id, self.eos_token_id, self.pad_token_id):
                continue
            words.append(self._id_to_str.get(i, f"<{i}>"))
        return " ".join(words)

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        return [self.decode(ids, skip_special_tokens) for ids in batch]
