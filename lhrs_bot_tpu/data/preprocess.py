"""Tokenization + loss-mask construction (numpy, host-side).

Behavioral parity with the reference preprocessing pipeline
(lhrs/Dataset/cap_dataset.py:857-1084), which defines the training loss and
eval prompts exactly:

  * tokenizer_image_token (:1065-1084): tokenize around "<image>" chunks and
    splice IMAGE_TOKEN_INDEX(-200) between them, keeping a single BOS;
  * preprocess_plain (:955-974): stage-1 captioning — question becomes
    literally "<image>", question tokens masked;
  * preprocess_llama_2 (:884-952): split rendered conversation on "</s>",
    mask everything except assistant responses using the "[/INST] " separator
    with the -2 instruction-length offset, and the cur_len != total_len
    mask-everything safety check;
  * preprocess_v1 (:977-1048): same with the TWO separator style;
  * preprocess_multimodal (:857-881): normalize "<image>" to the front of
    the first turn, optional <im_start>/<im_end> wrap.

The tokenizer is any HF-compatible object with __call__(text).input_ids,
bos_token_id, pad_token_id and model_max_length.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..models.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from . import conversation as conversation_lib
from .conversation import SeparatorStyle


def tokenizer_image_token(
    prompt: str,
    tokenizer,
    image_token_index: int = IMAGE_TOKEN_INDEX,
) -> List[int]:
    chunks = [tokenizer(c).input_ids for c in prompt.split(DEFAULT_IMAGE_TOKEN)]

    ids: List[int] = []
    offset = 0
    if chunks and chunks[0] and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        ids.append(chunks[0][0])

    sep = [image_token_index] * (offset + 1)
    interleaved: List[List[int]] = []
    for i, chunk in enumerate(chunks):
        interleaved.append(chunk)
        if i != len(chunks) - 1:
            interleaved.append(sep)
    for part in interleaved:
        ids.extend(part[offset:])
    return ids


def preprocess_multimodal(
    sources: List[Dict[str, Optional[str]]],
    tune_im_start: bool = False,
) -> List[Dict[str, Optional[str]]]:
    if not isinstance(sources, list):
        sources = [sources]
    for source in sources:
        for key, value in source.items():
            if value is not None and DEFAULT_IMAGE_TOKEN in value:
                value = value.replace(DEFAULT_IMAGE_TOKEN, "").strip()
                value = (DEFAULT_IMAGE_TOKEN + "\n" + value).strip()
                # mmtag templates wrap the image slot in <Image>...</Image>
                # BEFORE the optional im_start wrap (cap_dataset.py:869-876)
                if "mmtag" in conversation_lib.default_conversation.version:
                    value = value.replace(
                        DEFAULT_IMAGE_TOKEN,
                        "<Image>" + DEFAULT_IMAGE_TOKEN + "</Image>")
                if tune_im_start:
                    value = value.replace(
                        DEFAULT_IMAGE_TOKEN,
                        DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                        + DEFAULT_IM_END_TOKEN)
                source[key] = value
    return sources


def wrap_image_token_for_generation(text: str,
                                    tune_im_start: bool = False) -> str:
    """Generation-side image-slot wrapping (text_modal.py:546-562 parity):
    normalize "<image>" to the front, apply the mmtag <Image>...</Image>
    wrap when the ACTIVE template's version contains "mmtag", then the
    optional im_start/im_end wrap. Identity for non-mmtag templates without
    tune_im_start (the published recipes)."""
    if DEFAULT_IMAGE_TOKEN not in text:
        return text
    text = text.replace(DEFAULT_IMAGE_TOKEN, "").strip()
    text = (DEFAULT_IMAGE_TOKEN + "\n" + text).strip()
    if "mmtag" in conversation_lib.default_conversation.version:
        text = text.replace(
            DEFAULT_IMAGE_TOKEN,
            "<Image>" + DEFAULT_IMAGE_TOKEN + "</Image>")
    if tune_im_start:
        text = text.replace(
            DEFAULT_IMAGE_TOKEN,
            DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
            + DEFAULT_IM_END_TOKEN)
    return text


def _render_conversation(sources: Sequence[Dict], conv) -> str:
    roles = {"Question": conv.roles[0], "Answer": conv.roles[1],
             "value": conv.roles[1]}
    for source in sources:
        for j, key in enumerate(source):
            role = roles[key]
            assert role == conv.roles[j % 2], f"role order violation at {key}"
            conv.append_message(role, source[key])
    return conv.get_prompt()


def preprocess_plain(sources: Sequence[Dict], tokenizer) -> Dict:
    """Stage-1 captioning: prompt := "<image>" + answer + sep; mask the
    question tokens."""
    conv = conversation_lib.default_conversation
    conversations = []
    for source in sources:
        assert len(source) == 2
        assert DEFAULT_IMAGE_TOKEN in source["Question"]
        source["Question"] = DEFAULT_IMAGE_TOKEN
        conversations.append(
            source["Question"] + source["Answer"] + conv.sep)

    input_ids = [
        np.asarray(tokenizer_image_token(c, tokenizer), np.int64)
        for c in conversations
    ]
    labels = [ids.copy() for ids in input_ids]
    for lab, source in zip(labels, sources):
        q_len = len(tokenizer_image_token(source["Question"], tokenizer))
        lab[:q_len] = IGNORE_INDEX
    return dict(input_ids=input_ids, labels=labels)


def _mask_rounds(
    conversation: str,
    target: np.ndarray,
    tokenizer,
    sep: str,
    sep2: str,
    has_image: bool,
) -> None:
    """Shared masking loop of preprocess_llama_2/preprocess_v1."""
    total_len = int((target != tokenizer.pad_token_id).sum())
    rounds = conversation.split(sep2)
    cur_len = 1
    target[:cur_len] = IGNORE_INDEX
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        if len(parts) != 2:
            break
        parts[0] += sep
        if has_image:
            round_len = len(tokenizer_image_token(rou, tokenizer))
            instruction_len = len(tokenizer_image_token(parts[0], tokenizer)) - 2
        else:
            round_len = len(tokenizer(rou).input_ids)
            instruction_len = len(tokenizer(parts[0]).input_ids) - 2
        target[cur_len:cur_len + instruction_len] = IGNORE_INDEX
        cur_len += round_len
    target[cur_len:] = IGNORE_INDEX
    if cur_len < tokenizer.model_max_length and cur_len != total_len:
        # tokenization mismatch → drop the sample from the loss
        target[:] = IGNORE_INDEX


def preprocess_llama_2(sources, tokenizer, has_image: bool = False) -> Dict:
    conv = conversation_lib.default_conversation.copy()
    conversation = _render_conversation(sources, conv)
    assert conv.sep_style == SeparatorStyle.LLAMA_2

    if has_image:
        input_ids = np.asarray(
            [tokenizer_image_token(conversation, tokenizer)], np.int64)
    else:
        ids = tokenizer(conversation).input_ids[:tokenizer.model_max_length]
        input_ids = np.asarray([ids], np.int64)

    targets = input_ids.copy()
    for convo, target in zip([conversation], targets):
        _mask_rounds(convo, target, tokenizer, sep="[/INST] ",
                     sep2=conv.sep2, has_image=has_image)
    return dict(input_ids=input_ids, labels=targets)


def preprocess_v1(sources, tokenizer, has_image: bool = False) -> Dict:
    conv = conversation_lib.default_conversation.copy()
    conversation = _render_conversation(sources, conv)
    assert conv.sep_style == SeparatorStyle.TWO

    if has_image:
        input_ids = np.asarray(
            [tokenizer_image_token(conversation, tokenizer)], np.int64)
    else:
        ids = tokenizer(conversation).input_ids[:tokenizer.model_max_length]
        input_ids = np.asarray([ids], np.int64)

    targets = input_ids.copy()
    sep = conv.sep + conv.roles[1] + ": "
    for convo, target in zip([conversation], targets):
        _mask_rounds(convo, target, tokenizer, sep=sep, sep2=conv.sep2,
                     has_image=has_image)
    return dict(input_ids=input_ids, labels=targets)


def preprocess(sources, tokenizer, has_image: bool = False) -> Dict:
    style = conversation_lib.default_conversation.sep_style
    if style == SeparatorStyle.PLAIN:
        return preprocess_plain(copy.deepcopy(sources), tokenizer)
    if style == SeparatorStyle.LLAMA_2:
        return preprocess_llama_2(sources, tokenizer, has_image=has_image)
    if conversation_lib.default_conversation.version.startswith("v1"):
        return preprocess_v1(sources, tokenizer, has_image=has_image)
    raise ValueError(f"unsupported separator style {style}")
