"""Vectorized multimodal embedding splice (static shapes, jit-friendly).

Behavioral parity with the reference's prepare_inputs_for_multimodal
(lhrs/models/text_modal.py:296-526), which replaces each IMAGE_TOKEN_INDEX
(-200) placeholder with the perceiver's image embeddings in a *per-sample
Python loop* — a CPU-side serialization SURVEY.md §3.1 flags as the thing the
TPU build must vectorize.

Semantics reproduced (single image per sample, the trained configuration —
tune_im_start=False in all published configs):
  * the -200 token expands to num_image_tokens embeddings;
  * labels at image positions become IGNORE_INDEX;
  * rows without an image token keep their text unchanged;
  * all rows are right-padded (zeros / IGNORE_INDEX / attention False) to the
    common static length T + num_image_tokens - 1.

Design: one gather per tensor, computed from broadcasted position indices —
no data-dependent shapes, no host round-trips. The image row-offset means a
sample's text token at index i lands at output index i + (num_img - 1) *
(i > img_pos).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


class SplicedBatch(NamedTuple):
    inputs_embeds: jnp.ndarray  # (B, T_out, D)
    attention_mask: jnp.ndarray  # (B, T_out) bool
    labels: Optional[jnp.ndarray]  # (B, T_out) int32 or None
    seq_len: jnp.ndarray  # (B,) int32 — valid length per row
    segment_ids: Optional[jnp.ndarray] = None  # (B, T_out) int32, packing


def splice_image_embeddings(
    input_ids: jnp.ndarray,  # (B, T) int32, may contain one -200 per row
    image_embeds: jnp.ndarray,  # (B, N_img, D)
    embed_tokens: jnp.ndarray,  # (V, D) embedding table
    attention_mask: Optional[jnp.ndarray] = None,  # (B, T) bool
    labels: Optional[jnp.ndarray] = None,  # (B, T) int32
) -> SplicedBatch:
    b, t = input_ids.shape
    n_img = image_embeds.shape[1]
    t_out = t + n_img - 1

    is_img = input_ids == IMAGE_TOKEN_INDEX
    has_img = jnp.any(is_img, axis=1)  # (B,)
    img_pos = jnp.argmax(is_img, axis=1).astype(jnp.int32)  # first -200; 0 if none
    # rows without an image: sentinel past the end so no output position
    # classifies as "inside image"
    img_pos = jnp.where(has_img, img_pos, t_out + 1)

    if attention_mask is None:
        attention_mask = jnp.ones((b, t), dtype=bool)
    valid_in = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
    seq_len = jnp.where(has_img, valid_in + n_img - 1, valid_in)

    out_pos = jnp.arange(t_out, dtype=jnp.int32)[None, :]  # (1, T_out)
    ip = img_pos[:, None]  # (B, 1)
    before = out_pos < ip
    inside = (out_pos >= ip) & (out_pos < ip + n_img)
    # text source index for each output position
    text_idx = jnp.where(before, out_pos, out_pos - (n_img - 1))
    text_valid = ~inside & (text_idx >= 0) & (text_idx < t)
    text_idx_safe = jnp.clip(text_idx, 0, t - 1)

    gathered_ids = jnp.take_along_axis(input_ids, text_idx_safe, axis=1)
    # never index the embedding table with the -200 marker
    gathered_ids_safe = jnp.where(gathered_ids == IMAGE_TOKEN_INDEX, 0,
                                  gathered_ids)
    text_embeds = jnp.take(embed_tokens, gathered_ids_safe, axis=0)

    img_idx = jnp.clip(out_pos - ip, 0, n_img - 1)
    img_embeds_g = jnp.take_along_axis(
        image_embeds, img_idx[..., None], axis=1)

    gathered_attn = jnp.take_along_axis(attention_mask, text_idx_safe, axis=1)
    # padding positions are zero embeddings, matching the reference's
    # right-pad-with-zeros alignment (text_modal.py:443-457)
    emb_valid = text_valid & gathered_attn
    embeds = jnp.where(
        inside[..., None], img_embeds_g.astype(text_embeds.dtype),
        jnp.where(emb_valid[..., None], text_embeds,
                  jnp.zeros((), text_embeds.dtype)),
    )
    attn_out = inside | (text_valid & gathered_attn)

    labels_out = None
    if labels is not None:
        gathered_labels = jnp.take_along_axis(labels, text_idx_safe, axis=1)
        labels_out = jnp.where(
            inside | ~text_valid, IGNORE_INDEX,
            jnp.where(gathered_attn, gathered_labels, IGNORE_INDEX))

    return SplicedBatch(embeds, attn_out, labels_out, seq_len.astype(jnp.int32))


def splice_image_embeddings_multi(
    input_ids: jnp.ndarray,     # (B, T) int32, up to K -200 markers per row
    image_embeds: jnp.ndarray,  # (B, K, N_img, D) — slot k for marker k
    embed_tokens: jnp.ndarray,  # (V, D)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, T) bool
    labels: Optional[jnp.ndarray] = None,  # (B, T) int32
    segment_ids: Optional[jnp.ndarray] = None,  # (B, T) int32, packing
) -> SplicedBatch:
    """K-image generalization of the splice (the reference's per-sample
    loop handles arbitrary image counts, text_modal.py:296-526; published
    recipes train single-image, so this serves the multi-image CHAT
    surface). Marker k in reading order expands to image slot k's N
    embeddings; rows with fewer markers leave their trailing slots unused.
    Static output width T + K*(N-1); same gather-only construction as the
    single-image path."""
    b, t = input_ids.shape
    k_max, n_img = image_embeds.shape[1:3]
    t_out = t + k_max * (n_img - 1)
    sentinel = t_out + n_img + 1

    is_img = input_ids == IMAGE_TOKEN_INDEX
    pos = jnp.where(is_img, jnp.arange(t)[None, :], sentinel)
    img_pos = jnp.sort(pos, axis=1)[:, :k_max]          # (B, K) ascending
    # span k starts at its marker shifted by the expansion of spans before
    start = img_pos + (n_img - 1) * jnp.arange(k_max)[None, :]  # (B, K)

    if attention_mask is None:
        attention_mask = jnp.ones((b, t), dtype=bool)
    valid_in = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
    k_count = jnp.minimum(jnp.sum(is_img, axis=1), k_max)
    seq_len = valid_in + (n_img - 1) * k_count

    out_pos = jnp.arange(t_out, dtype=jnp.int32)[None, :, None]  # (1,To,1)
    st = start[:, None, :]                                       # (B,1,K)
    inside_k = (out_pos >= st) & (out_pos < st + n_img)          # (B,To,K)
    inside = jnp.any(inside_k, axis=-1)                          # (B, To)
    which = jnp.argmax(inside_k, axis=-1).astype(jnp.int32)      # (B, To)
    start_w = jnp.take_along_axis(start, which, axis=1)          # (B, To)
    off = jnp.clip(out_pos[..., 0] - start_w, 0, n_img - 1)
    flat_idx = which * n_img + off                               # (B, To)
    img_flat = image_embeds.reshape(b, k_max * n_img, -1)
    img_g = jnp.take_along_axis(img_flat, flat_idx[..., None], axis=1)

    full_before = jnp.sum(out_pos[..., 0, None] >= st + n_img, axis=-1)
    text_idx = out_pos[..., 0] - (n_img - 1) * full_before
    text_valid = ~inside & (text_idx >= 0) & (text_idx < t)
    text_idx_safe = jnp.clip(text_idx, 0, t - 1)
    gathered_ids = jnp.take_along_axis(input_ids, text_idx_safe, axis=1)
    gathered_ids_safe = jnp.where(gathered_ids == IMAGE_TOKEN_INDEX, 0,
                                  gathered_ids)
    text_embeds = jnp.take(embed_tokens, gathered_ids_safe, axis=0)
    gathered_attn = jnp.take_along_axis(attention_mask, text_idx_safe,
                                        axis=1)
    emb_valid = text_valid & gathered_attn
    embeds = jnp.where(
        inside[..., None], img_g.astype(text_embeds.dtype),
        jnp.where(emb_valid[..., None], text_embeds,
                  jnp.zeros((), text_embeds.dtype)))
    attn_out = inside | (text_valid & gathered_attn)

    labels_out = None
    if labels is not None:
        gathered_labels = jnp.take_along_axis(labels, text_idx_safe, axis=1)
        labels_out = jnp.where(
            inside | ~text_valid, IGNORE_INDEX,
            jnp.where(gathered_attn, gathered_labels, IGNORE_INDEX))

    seg_out = None
    if segment_ids is not None:
        # text positions keep their segment; an image span inherits the
        # segment of its marker; everything else (padding) is segment 0
        seg_text = jnp.take_along_axis(segment_ids, text_idx_safe, axis=1)
        marker_seg = jnp.take_along_axis(
            segment_ids, jnp.clip(img_pos, 0, t - 1), axis=1)   # (B, K)
        seg_img = jnp.take_along_axis(marker_seg, which, axis=1)
        seg_out = jnp.where(
            inside, seg_img,
            jnp.where(text_valid & gathered_attn, seg_text, 0)
        ).astype(jnp.int32)

    return SplicedBatch(embeds, attn_out, labels_out,
                        seq_len.astype(jnp.int32), seg_out)
