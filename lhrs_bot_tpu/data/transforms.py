"""Host-side image preprocessing → uint8; normalization runs on device.

Behavioral parity with the reference transform policy
(lhrs/Dataset/build_transform.py:9-73): for ViT architectures the pipeline is
HF CLIPImageProcessor — bicubic resize of the shortest edge to 224, center
crop 224 — followed by rescale+normalize. Here resize+crop happen on CPU
(PIL) and produce uint8; the rescale/normalize/patchify/projection all fuse
into the device patch-embed kernel (ops/patch_embed.py), so the host ships 3
bytes/pixel instead of 12.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def clip_preprocess_uint8(image, size: int = 224) -> np.ndarray:
    """PIL image / ndarray → (size, size, 3) uint8 via shortest-edge bicubic
    resize + center crop (CLIPImageProcessor geometry)."""
    if not _HAS_PIL:
        raise RuntimeError("PIL required for image preprocessing")
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    image = image.convert("RGB")

    w, h = image.size
    short = min(w, h)
    scale = size / short
    new_w, new_h = round(w * scale), round(h * scale)
    image = image.resize((new_w, new_h), Image.BICUBIC)

    left = (new_w - size) // 2
    top = (new_h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    return np.asarray(image, dtype=np.uint8)


def eval_resize_crop_uint8(image, resize: int = 256,
                           crop: int = 224) -> np.ndarray:
    """Non-ViT eval geometry: Resize(256) → CenterCrop(224)
    (build_transform.py:60-73)."""
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    image = image.convert("RGB").resize((resize, resize), Image.BICUBIC)
    left = (resize - crop) // 2
    image = image.crop((left, left, left + crop, left + crop))
    return np.asarray(image, dtype=np.uint8)
