"""Rotary position embeddings (LLaMA-2 / HF rotate-half layout).

The weights we import come from HF LLaMA checkpoints, so we use HF's
rotate-half convention: the head dim is split into two contiguous halves
[x1, x2] and rotated as [x1*cos - x2*sin, x2*cos + x1*sin], with
inv_freq = theta ** (-2i/d).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _inv_freq(head_dim: int, theta: float) -> tuple:
    import numpy as np

    freqs = theta ** (-np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    return tuple(freqs.astype(np.float32).tolist())


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float = 10000.0
) -> tuple:
    """cos/sin tables for integer positions.

    positions: (...,) int32 → cos, sin: (..., head_dim) float32, with the
    half-dim frequency pattern tiled twice (HF layout).
    """
    inv = jnp.asarray(_inv_freq(head_dim, theta), dtype=jnp.float32)
    angles = positions.astype(jnp.float32)[..., None] * inv  # (..., d/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., d)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding.

    x:   (..., seq, num_heads, head_dim)
    cos/sin: (..., seq, head_dim) — broadcast over the heads axis.
    """
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
