"""Gated SiLU MLP (LLaMA-2) and GELU MLP (ViT/perceiver).

Replaces torch's fused MLP path. Expressed so XLA fuses the elementwise gate
into the surrounding matmuls; weights stay (in, out)-major so the MXU sees
large [tokens, d] x [d, ffn] contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    h = jnp.dot(x, w_fc, preferred_element_type=jnp.float32) + b_fc
    if quick_gelu:
        # CLIP's QuickGELU: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    h = h.astype(x.dtype)
    return (
        jnp.dot(h, w_proj, preferred_element_type=jnp.float32) + b_proj
    ).astype(x.dtype)
