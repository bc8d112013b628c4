"""Fused ViT patch embedding: uint8 image → normalized bf16 patch projections.

The reference does CLIPImageProcessor normalization on CPU dataloader workers
and a conv patch-embed on GPU (HF CLIPVisionModel). Here preprocessed uint8
images are shipped to the device and normalization + patchify + projection run
as one fused matmul: the conv with stride = kernel = patch is exactly a
[num_patches, patch*patch*3] x [patch*patch*3, width] contraction, and the
per-channel affine normalization folds into it algebraically.

JPEG-to-logits therefore needs only a H2D copy of uint8 pixels (BASELINE.json
north star).
"""

from __future__ import annotations

import jax.numpy as jnp

# CLIP's normalization constants (HF CLIPImageProcessor defaults).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, (H/p)*(W/p), p*p*C)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(b, gh * gw, patch * patch * c)


def patch_embed(
    images_uint8: jnp.ndarray,  # (B, H, W, 3) uint8, raw resized pixels
    w_patch: jnp.ndarray,  # (patch*patch*3, width) — flattened conv kernel
    *,
    patch: int = 14,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns (B, num_patches, width) in compute_dtype.

    Normalization ((x/255 - mean)/std) is folded in per input channel:
    out = ((x/255 - mean)/std) @ W = x @ (W * scale) + bias_term, computed here
    directly on the normalized values so any W works unmodified; XLA fuses the
    affine into the matmul's operand load.
    """
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)
    x = images_uint8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    patches = patchify(x.astype(compute_dtype), patch)
    return jnp.dot(
        patches, w_patch.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
