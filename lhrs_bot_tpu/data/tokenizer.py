"""Tokenizer loading.

Parity with TextModal.init_tokenizer (lhrs/models/text_modal.py:191-240):
slow LLaMA tokenizer, pad token bound to unk (id 0), right padding for
training, model_max_length from config.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger("lhrs_tpu")


def load_tokenizer(path: str, model_max_length: int = 2048,
                   padding_side: str = "right",
                   allow_fallback: bool = True):
    import os

    if not (path and (os.path.isdir(path) or os.path.isfile(path))):
        if not allow_fallback:
            raise FileNotFoundError(path)
        logger.warning(
            "tokenizer path %r not found locally — using the byte-level "
            "fallback tokenizer (smoke runs only; point text.path at a real "
            "LLaMA tokenizer for trained checkpoints)", path)
        return make_fallback_tokenizer(model_max_length=model_max_length)

    from transformers import AutoTokenizer

    try:
        tokenizer = AutoTokenizer.from_pretrained(
            path, use_fast=False, model_max_length=model_max_length,
            padding_side=padding_side)
    except Exception as exc:  # noqa: BLE001 — transformers raises many types
        # A checkpoint dir that exists but carries no usable tokenizer
        # files (e.g. weights-only exports) makes transformers attempt a
        # slow->fast conversion with vocab_file=None and die deep inside
        # (AttributeError). Same remedy as a missing path.
        if not allow_fallback:
            raise
        logger.warning(
            "tokenizer load from %r failed (%s: %s) — using the "
            "byte-level fallback tokenizer (smoke runs only)",
            path, type(exc).__name__, exc)
        return make_fallback_tokenizer(model_max_length=model_max_length)
    if tokenizer.pad_token is None:
        if tokenizer.unk_token is not None:
            tokenizer.pad_token = tokenizer.unk_token
        else:
            tokenizer.pad_token_id = 0
    return tokenizer


def make_fallback_tokenizer(vocab_size: int = 32000,
                            model_max_length: int = 2048):
    """Byte-level tokenizer with LLaMA-compatible special ids (pad 0, bos 1,
    eos 2) for environments without the real tokenizer files."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    # bytes 0..255 → ids 4..259
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    from tokenizers.pre_tokenizers import ByteLevel

    for i, ch in enumerate(sorted(ByteLevel.alphabet())):
        vocab[ch] = 4 + i
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    from tokenizers.processors import TemplateProcessing

    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", 1)])
    wrapped = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<pad>",
        model_max_length=model_max_length)
    return wrapped
