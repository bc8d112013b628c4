"""RMSNorm (LLaMA-2 style).

Replaces torch's LlamaRMSNorm (reference runs it inside HF LlamaForCausalLM,
lhrs/models/text_modal.py:30-60). Computed in float32 and cast back, matching
HF semantics. XLA fuses this into neighbouring ops; a fused
RMSNorm+matmul Pallas kernel is provided for the hot decode path.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    # HF LlamaRMSNorm casts back to input dtype *before* the weight multiply.
    return weight * normed.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm computed in fp32 and cast back (reference LayerNormFp32,
    lhrs/models/common_arch.py:242-250)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
