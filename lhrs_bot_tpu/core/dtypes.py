"""Dtype policy for TPU execution.

The reference selects torch dtypes from config strings (float16/bfloat16/...)
via a type_dict (lhrs/utils/eval_utils.py type_dict; Config/*.yaml `dtype:`).
On TPU the compute sweet spot is bfloat16 on the MXU with float32 accumulation;
float16 configs are mapped to bfloat16 (numerically safer on TPU — no loss
scaling needed, same memory footprint).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.bfloat16,  # TPU: fp16 configs run as bf16 (no GradScaler needed)
    "fp16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "int8": jnp.int8,
    "int4": jnp.int8,  # packed int4 kernels dequantize through int8
}


def resolve_dtype(name):
    if not isinstance(name, str):
        return name
    try:
        return _DTYPE_MAP[name.lower()]
    except KeyError as exc:
        raise ValueError(f"unknown dtype name: {name!r}") from exc


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Mixed-precision policy: params, compute, and output dtypes."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg) -> "DTypePolicy":
        compute = resolve_dtype(getattr(cfg, "dtype", "bfloat16"))
        if compute not in (jnp.float32, jnp.bfloat16):
            compute = jnp.bfloat16
        return cls(param_dtype=jnp.float32, compute_dtype=compute)

    def cast_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = DTypePolicy()
