"""Loader factory.

Parity with lhrs/Dataset/build_loader.py:26-235: stage-1 pretraining uses the
caption→VQA dataset, stages ≥2 use instruction data (optionally weighted
source mixing via weight_sample), zero-shot cls eval builds the folder
datasets; sampler/shuffle/drop_last policy follows the reference.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

from .collate import GenerationCollator, SupervisedCollator
from .datasets import (
    CaptionDatasetVQA,
    FolderClassificationDataset,
    InstructDataset,
    InstructDatasetWithTaskId,
    RSVQADataset,
)
from .loader import DataLoader, ShardedSampler, WeightedShardedSampler

logger = logging.getLogger("lhrs_tpu")


def build_loader(config, tokenizer, mode: str = "pretrain",
                 rank: int = 0, world_size: int = 1) -> DataLoader:
    if mode == "pretrain":
        return _build_vlp_loader(config, tokenizer, rank, world_size)
    raise ValueError(f"unknown mode {mode!r}")


def _build_vlp_loader(config, tokenizer, rank, world_size) -> DataLoader:
    stage = int(getattr(config, "stage", 1))
    data_path = config.data_path
    prompt_type = getattr(config, "prompt_template", "plain")
    image_size = int(config.rgb_vision.input_size[0])

    if stage <= 1 and (".tar" in str(data_path) or "{" in str(data_path)):
        # RS5M-style web-scale caption stream (brace-expanded tar shards)
        from .tario import RS5MDataset

        from . import conversation as conversation_lib

        conversation_lib.set_default_conversation(prompt_type)
        dataset = RS5MDataset(
            data_path, tokenizer, image_size=image_size,
            rank=rank, world_size=world_size,
            seed=int(getattr(config, "seed", 0)),
        )
        collate_fn = SupervisedCollator(tokenizer)
        if getattr(config, "pack_sequences", False):
            from .collate import PackingCollator

            factor = max(1, int(getattr(config, "pack_factor", 2)))
            collate_fn = PackingCollator(
                tokenizer,
                target_len=int(getattr(config, "pack_target_len", 0))
                or int(tokenizer.model_max_length),
                rows_per_batch=max(1, int(config.batch_size) // factor),
                max_images_per_row=int(
                    getattr(config, "pack_max_images", 4)))
        return _IterableLoader(
            dataset, batch_size=int(config.batch_size),
            collate_fn=collate_fn)

    if stage <= 1:
        dataset = CaptionDatasetVQA(
            data_path, tokenizer, image_size=image_size,
            prompt_type=prompt_type)
        sampler = None
    else:
        jsons = sorted(
            os.path.join(data_path, f) for f in os.listdir(data_path)
            if f.endswith(".json"))
        roots = [os.path.splitext(j)[0] + "_Image" for j in jsons]
        roots = [r if os.path.isdir(r) else data_path for r in roots]
        if getattr(config, "weight_sample", False):
            dataset = InstructDatasetWithTaskId(
                jsons, roots, tokenizer, image_size=image_size,
                prompt_type=prompt_type)
            sampler = WeightedShardedSampler(
                dataset.sample_weights, num_samples=len(dataset),
                rank=rank, world_size=world_size,
                seed=int(getattr(config, "seed", 0)))
        else:
            dataset = InstructDataset(
                jsons, roots, tokenizer, image_size=image_size,
                prompt_type=prompt_type)
            sampler = None

    collate_fn = SupervisedCollator(tokenizer)
    if getattr(config, "pack_sequences", False):
        # sequence packing: batch_size samples per step fill fewer,
        # denser rows (models/llama.py segment attention); biggest win
        # for the ragged stage-2/3 instruction data
        from .collate import PackingCollator

        factor = max(1, int(getattr(config, "pack_factor", 2)))
        collate_fn = PackingCollator(
            tokenizer,
            target_len=int(getattr(config, "pack_target_len", 0))
            or int(tokenizer.model_max_length),
            rows_per_batch=max(1, int(config.batch_size) // factor),
            max_images_per_row=int(
                getattr(config, "pack_max_images", 4)))
    return DataLoader(
        dataset,
        batch_size=int(config.batch_size),
        collate_fn=collate_fn,
        sampler=sampler,
        num_workers=int(getattr(config, "workers", 4)),
        rank=rank, world_size=world_size,
        seed=int(getattr(config, "seed", 0)),
    )


class _IterableLoader:
    """Batches an iterable (tar-stream) dataset; epoch length from the
    dataset's num_samples bookkeeping (with_epoch parity)."""

    def __init__(self, dataset, batch_size: int, collate_fn):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        return max(len(self.dataset) // self.batch_size, 1)

    def __iter__(self):
        batch = []
        for sample in self.dataset:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []


def build_zero_shot_loader(config, rank: int = 0,
                           world_size: int = 1) -> Tuple:
    """Classification eval loader (build_loader.py:167-199): returns
    (dataset, class_names)."""
    dataset = FolderClassificationDataset(
        config.data_path, image_size=int(config.rgb_vision.input_size[0]))
    return dataset, dataset.class_names
