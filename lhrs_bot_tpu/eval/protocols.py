"""Eval-protocol factories for training-time evaluation hooks.

Parity with the reference's EvalHook usage (hook/eval_hook.py:21-187): the
cls top-1 protocol and the COCO-style caption protocol packaged as zero-arg
callables returning metric dicts, pluggable into train.hooks.EvalHook (which
handles periodicity and best-checkpoint tracking).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from ..data import conversation as conv_lib
from ..data.preprocess import tokenizer_image_token
from ..models.constants import DEFAULT_IMAGE_TOKEN
from .caption import caption_eval
from .metrics import CLS_TEMPLATE, balanced_accuracy, classname_to_idx


def make_cls_eval_fn(
    engine,
    tokenizer,
    dataset,
    class_names: Sequence[str],
    *,
    batch_size: int = 8,
    max_new_tokens: int = 20,
    max_samples: Optional[int] = None,
    prompt_template: str = "llava_llama_2",
) -> Callable[[], Dict[str, float]]:
    """Zero-shot scene classification (main_cls.py protocol) as an eval_fn."""
    from ..serve.engine import GenerationConfig

    class_to_idx = {c: i for i, c in enumerate(class_names)}
    conv = conv_lib.conv_templates[prompt_template].copy()
    conv.append_message(
        conv.roles[0],
        DEFAULT_IMAGE_TOKEN + CLS_TEMPLATE.format(", ".join(class_names)))
    conv.append_message(conv.roles[1], None)
    prompt_ids = tokenizer_image_token(conv.get_prompt(), tokenizer)
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    def eval_fn() -> Dict[str, float]:
        n = min(len(dataset), max_samples or len(dataset))
        preds, trues = [], []
        for start in range(0, n, batch_size):
            items = [dataset[i] for i in range(start,
                                               min(start + batch_size, n))]
            images = np.stack([it["image"] for it in items])
            b = len(items)
            ids = np.tile(np.asarray(prompt_ids, np.int32)[None], (b, 1))
            lens = np.full((b,), len(prompt_ids), np.int32)
            out = engine.generate(ids, lens, images=images, gen_cfg=gen_cfg)
            preds += [tokenizer.decode(o, skip_special_tokens=True)
                      for o in out]
            trues += [it["label"] for it in items]
        pred_idx = classname_to_idx(preds, class_to_idx)
        return {"accuracy": balanced_accuracy(trues, pred_idx)}

    return eval_fn


def make_caption_eval_fn(
    engine,
    tokenizer,
    dataset,
    *,
    batch_size: int = 8,
    max_new_tokens: int = 48,
    max_samples: Optional[int] = None,
    prompt: str = "Describe the image concisely.",
    prompt_template: str = "llava_llama_2",
) -> Callable[[], Dict[str, float]]:
    """COCO-style caption eval (BLEU/CIDEr/ROUGE-L) as an eval_fn
    (eval_hook.py caption branch parity, without pycocoevalcap)."""
    from ..serve.engine import GenerationConfig

    from ..data.preprocess import wrap_image_token_for_generation

    conv = conv_lib.conv_templates[prompt_template].copy()
    conv.append_message(
        conv.roles[0],
        wrap_image_token_for_generation(DEFAULT_IMAGE_TOKEN + "\n" + prompt))
    conv.append_message(conv.roles[1], None)
    prompt_ids = tokenizer_image_token(conv.get_prompt(), tokenizer)
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    def eval_fn() -> Dict[str, float]:
        n = min(len(dataset), max_samples or len(dataset))
        preds, refs = [], []
        for start in range(0, n, batch_size):
            items = [dataset[i] for i in range(start,
                                               min(start + batch_size, n))]
            images = np.stack([it["image"] for it in items])
            b = len(items)
            ids = np.tile(np.asarray(prompt_ids, np.int32)[None], (b, 1))
            lens = np.full((b,), len(prompt_ids), np.int32)
            out = engine.generate(ids, lens, images=images, gen_cfg=gen_cfg)
            preds += [tokenizer.decode(o, skip_special_tokens=True)
                      for o in out]
            refs += [[it["caption"]] for it in items]
        metrics = caption_eval(preds, refs)
        metrics["accuracy"] = metrics["cider"]  # best-ckpt key for EvalHook
        return metrics

    return eval_fn
