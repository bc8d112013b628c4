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


class PackingCollator:
    """Sequence-packing batches: multiple samples share a row with
    segment ids (block-diagonal attention + per-segment RoPE in
    models/llama.py). Instruction tuning pads heavily — samples span
    ~40-2000 tokens — so packing recovers the padded-token compute the
    reference wastes (its GPUs pad identically; this is a TPU-budget
    optimization, not a parity item).

    STATIC SHAPES: every batch is exactly (rows_per_batch, target_len)
    with an optional (rows_per_batch, max_images_per_row, H, W, 3) image
    stack — one compiled train step regardless of packing density. The
    collator is stateful (safe: the loader collates in one producer
    thread): rows that do not fill a batch carry over to the next call,
    and each sample's first-token label is forced to IGNORE so the
    shifted loss never predicts across a segment boundary. Rows left
    open when an epoch ends roll into the next epoch (iteration-based
    training semantics)."""

    def __init__(self, tokenizer, target_len: int = 512,
                 rows_per_batch: int = 4, max_images_per_row: int = 4):
        self.tokenizer = tokenizer
        self.target_len = target_len
        self.rows_per_batch = rows_per_batch
        self.max_images_per_row = max_images_per_row
        self._open: list = []  # carryover rows between calls

    def _fit(self, inst: Dict) -> None:
        ids = np.asarray(inst["input_ids"], np.int64)
        labels = np.asarray(inst["labels"], np.int64).copy()
        n = len(ids)
        if n > self.target_len:  # oversize sample: own truncated row
            ids, labels = ids[:self.target_len], labels[:self.target_len]
            n = self.target_len
        labels[0] = IGNORE_INDEX  # boundary guard for the shifted loss
        img = inst.get("image")
        home = None
        for row in self._open:
            if len(row["ids"]) + n > self.target_len:
                continue
            if img is not None and (len(row["images"])
                                    >= self.max_images_per_row):
                continue
            home = row
            break
        if home is None:
            home = {"ids": [], "labels": [], "segs": [], "images": []}
            self._open.append(home)
        seg = (home["segs"][-1] if home["segs"] else 0) + 1
        home["ids"].extend(ids.tolist())
        home["labels"].extend(labels.tolist())
        home["segs"].extend([seg] * n)
        if img is not None:
            home["images"].append(np.asarray(img))

    def __call__(self, instances: Sequence[Dict]) -> Dict[str, np.ndarray]:
        for inst in instances:
            self._fit(inst)
        emit, self._open = (self._open[:self.rows_per_batch],
                            self._open[self.rows_per_batch:])
        b, width = self.rows_per_batch, self.target_len
        pad_id = self.tokenizer.pad_token_id
        ids = np.full((b, width), pad_id, np.int32)
        labels = np.full((b, width), IGNORE_INDEX, np.int32)
        segs = np.zeros((b, width), np.int32)
        any_image = any(r["images"] for r in emit)
        imgs = None
        for row_i, row in enumerate(emit):
            n = len(row["ids"])
            ids[row_i, :n] = row["ids"]
            labels[row_i, :n] = row["labels"]
            segs[row_i, :n] = row["segs"]
            if any_image and imgs is None and row["images"]:
                h = row["images"][0].shape[0]
                imgs = np.zeros(
                    (b, self.max_images_per_row) + row["images"][0].shape,
                    np.uint8)
            if row["images"]:
                for k, im in enumerate(row["images"]):
                    imgs[row_i, k] = im
        batch = {
            "input_ids": ids,
            "labels": labels,
            "attention_mask": segs != 0,
            "segment_ids": segs,
        }
        if imgs is not None:
            batch["images"] = imgs
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
