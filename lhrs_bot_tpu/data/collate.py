"""Batch collators.

Behavioral parity with the reference collators:
  * DataCollatorForSupervisedDataset (cap_dataset.py:775-810): right-pad
    input_ids with pad_token, labels with IGNORE_INDEX, truncate to
    model_max_length, attention_mask = ids != pad, stack images;
  * DataCollatorForVGSupervisedDataset (cap_dataset.py:813-854) and the VQA
    collator (rsvqa.py:208-262) left-pad for HF generate.

TPU-first deviation for generation: the decode engine uses right-padded
prompts + explicit per-row lengths (static-shape KV cache appends at
`length`), so the generation collator right-pads and returns seq_lens. A
left_pad flag is kept for parity testing against the reference layout.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..models.constants import IGNORE_INDEX


def _pad_to(arr: np.ndarray, length: int, value: int, left: bool) -> np.ndarray:
    pad = length - len(arr)
    if pad <= 0:
        return arr[:length]
    padding = np.full((pad,), value, dtype=arr.dtype)
    return np.concatenate([padding, arr] if left else [arr, padding])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stack_images(instances) -> "np.ndarray | None":
    """Stack per-sample images; text-only rows in a mixed batch (stage-3
    weighted mixing adds text-only geosignal records) get zero images —
    their prompts carry no image token, so the splice never reads them."""
    imgs = [inst.get("image") for inst in instances]
    present = [im for im in imgs if im is not None]
    if not present:
        return None
    shape = np.asarray(present[0]).shape
    return np.stack([
        np.asarray(im) if im is not None else np.zeros(shape, np.uint8)
        for im in imgs
    ])


def _check_single_image(rows) -> None:
    """The static-shape splice supports at most one image token per sample
    (the trained configuration; reference datasets guarantee this too,
    cap_dataset.py:401-427). Catch violations at the host boundary instead
    of producing silently wrong masks on device."""
    from ..models.constants import IMAGE_TOKEN_INDEX

    for i, row in enumerate(rows):
        n = int(np.sum(np.asarray(row) == IMAGE_TOKEN_INDEX))
        if n > 1:
            raise ValueError(
                f"sample {i} contains {n} image tokens; at most one is "
                "supported per sequence")


class SupervisedCollator:
    """Training batches: right-padded ids/labels/mask + stacked images.

    pad_multiple rounds the sequence length up (default 64) so jit sees a
    small, finite set of shapes instead of one per max-length — a TPU
    compile-cache concern the reference doesn't have.
    """

    def __init__(self, tokenizer, pad_multiple: int = 64,
                 max_length: Optional[int] = None):
        self.tokenizer = tokenizer
        self.pad_multiple = pad_multiple
        self.max_length = max_length or tokenizer.model_max_length

    def __call__(self, instances: Sequence[Dict]) -> Dict[str, np.ndarray]:
        ids = [np.asarray(inst["input_ids"], np.int64)[:self.max_length]
               for inst in instances]
        _check_single_image(ids)
        labels = [np.asarray(inst["labels"], np.int64)[:self.max_length]
                  for inst in instances]
        width = min(_round_up(max(len(x) for x in ids), self.pad_multiple),
                    self.max_length)
        pad_id = self.tokenizer.pad_token_id
        input_ids = np.stack([_pad_to(x, width, pad_id, False) for x in ids])
        labels_arr = np.stack(
            [_pad_to(x, width, IGNORE_INDEX, False) for x in labels])
        batch = {
            "input_ids": input_ids.astype(np.int32),
            "labels": labels_arr.astype(np.int32),
            "attention_mask": input_ids != pad_id,
        }
        images = _stack_images(instances)
        if images is not None:
            batch["images"] = images
        return batch


class GenerationCollator:
    """Eval/generation batches: padded ids + per-row lengths (+ pass-through
    metadata fields such as targets/types/question ids)."""

    def __init__(self, tokenizer, pad_multiple: int = 64,
                 max_length: Optional[int] = None, left_pad: bool = False,
                 extra_keys: Sequence[str] = ()):
        self.tokenizer = tokenizer
        self.pad_multiple = pad_multiple
        self.max_length = max_length or tokenizer.model_max_length
        self.left_pad = left_pad
        self.extra_keys = tuple(extra_keys)

    def __call__(self, instances: Sequence[Dict]) -> Dict[str, np.ndarray]:
        ids = [np.asarray(inst["input_ids"], np.int64)[:self.max_length]
               for inst in instances]
        _check_single_image(ids)
        width = min(_round_up(max(len(x) for x in ids), self.pad_multiple),
                    self.max_length)
        pad_id = self.tokenizer.pad_token_id
        input_ids = np.stack(
            [_pad_to(x, width, pad_id, self.left_pad) for x in ids])
        batch = {
            "input_ids": input_ids.astype(np.int32),
            "attention_mask": input_ids != pad_id,
            "seq_lens": np.asarray([min(len(x), width) for x in ids],
                                   np.int32),
        }
        images = _stack_images(instances)
        if images is not None:
            batch["images"] = images
        for key in self.extra_keys:
            if key in instances[0]:
                vals = [inst[key] for inst in instances]
                batch[key] = (np.asarray(vals)
                              if np.isscalar(vals[0]) or isinstance(
                                  vals[0], (int, float, np.integer))
                              else vals)
        return batch
