"""Gated SiLU MLP (LLaMA-2) and GELU MLP (ViT/perceiver).

Replaces torch's fused MLP path. Expressed so XLA fuses the elementwise gate
into the surrounding matmuls; weights stay (in, out)-major so the MXU sees
large [tokens, d] x [d, ffn] contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor, w8a8_matmul


def dense_any(x: jnp.ndarray, w, b=None) -> jnp.ndarray:
    """Matmul accepting bf16/f32 weights or QuantizedTensors; quantized
    weights take the full-int8 (W8A8, dynamic activation quant) MXU path."""
    if isinstance(w, QuantizedTensor):
        y = w8a8_matmul(x, w)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def silu_mlp(
    x: jnp.ndarray,
    w_gate: jnp.ndarray,  # (d, ffn)
    w_up: jnp.ndarray,  # (d, ffn)
    w_down: jnp.ndarray,  # (ffn, d)
) -> jnp.ndarray:
    gate = jnp.dot(x, w_gate, preferred_element_type=jnp.float32)
    up = jnp.dot(x, w_up, preferred_element_type=jnp.float32)
    hidden = (jax.nn.silu(gate) * up).astype(x.dtype)
    return jnp.dot(hidden, w_down, preferred_element_type=jnp.float32).astype(x.dtype)


def gelu_mlp(
    x: jnp.ndarray,
    w_fc: jnp.ndarray,  # (d, ffn)
    b_fc: jnp.ndarray,
    w_proj: jnp.ndarray,  # (ffn, d)
    b_proj: jnp.ndarray,
    *,
    quick_gelu: bool = False,
) -> jnp.ndarray:
    h = dense_any(x, w_fc).astype(jnp.float32) + b_fc
    if quick_gelu:
        # CLIP's QuickGELU: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    h = h.astype(x.dtype)
    return (dense_any(h, w_proj).astype(jnp.float32) + b_proj).astype(x.dtype)
