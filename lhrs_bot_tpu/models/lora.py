"""LoRA adapters for the stacked-layer LLaMA decoder.

Capability parity with the reference's peft LoRA usage
(lhrs/models/text_modal.py:133-151, find_all_linear_names :658-667): adapters
on every decoder linear (q/k/v/o/gate/up/down projections, lm_head excluded),
r=128, alpha=256, plus the detect-and-merge load behavior
(lhrs/models/UniBind.py:105-116).

TPU-first formulation: adapters live as (L, d_in, r)/(L, r, d_out) stacked
tensors mirroring the stacked base weights, and training *merges* them into
the (stop-gradiented) base each step — one small matmul per projection
(<1% of step FLOPs at 7B) instead of a low-rank side path threaded through
every block. Gradients flow to A/B through the merge; the merged weights are
also exactly what inference uses, so "merge_and_unload" is the identity of
the training computation.

Deviation noted: peft's per-token LoRA dropout has no merged-form equivalent;
we omit it (lora_dropout=0.05 in the reference recipe acts as a weak
regularizer only).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .llama import LlamaConfig

# stacked-layer projection name → (d_in attr, d_out attr)
TARGET_SHAPES = {
    "wq": ("hidden_size", "hidden_size"),
    "wk": ("hidden_size", "hidden_size"),
    "wv": ("hidden_size", "hidden_size"),
    "wo": ("hidden_size", "hidden_size"),
    "w_gate": ("hidden_size", "intermediate_size"),
    "w_up": ("hidden_size", "intermediate_size"),
    "w_down": ("intermediate_size", "hidden_size"),
}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    dropout: float = 0.05  # recorded; see deviation note above
    targets: Tuple[str, ...] = tuple(TARGET_SHAPES)

    @property
    def scale(self) -> float:
        return self.alpha / self.r

    @classmethod
    def from_config_dict(cls, lora_cfg) -> "LoraConfig":
        return cls(r=lora_cfg.lora_r, alpha=lora_cfg.lora_alpha,
                   dropout=lora_cfg.lora_dropout)


def init_lora_params(rng: jax.Array, llama_cfg: LlamaConfig,
                     lora_cfg: LoraConfig, dtype=jnp.float32):
    """A ~ kaiming-ish normal, B = 0 (peft convention: adapter starts as a
    no-op)."""
    L = llama_cfg.num_hidden_layers
    params = {}
    keys = jax.random.split(rng, len(lora_cfg.targets))
    for key, name in zip(keys, lora_cfg.targets):
        din_attr, dout_attr = TARGET_SHAPES[name]
        d_in = getattr(llama_cfg, din_attr)
        d_out = getattr(llama_cfg, dout_attr)
        params[name] = {
            "a": (jax.random.normal(key, (L, d_in, lora_cfg.r))
                  * (1.0 / jnp.sqrt(d_in))).astype(dtype),
            "b": jnp.zeros((L, lora_cfg.r, d_out), dtype),
        }
    return params


def attach_runtime_lora(base_layers: Dict[str, jnp.ndarray], lora_params,
                        lora_cfg: LoraConfig) -> Dict[str, jnp.ndarray]:
    """QLoRA-style attachment: keep the (possibly quantized) base weights
    untouched and add `<name>__lora_a` / `<name>__lora_b` entries consumed by
    the decoder's _proj side path (y = xW + (xA)(B·scale)). Used when the
    base is quantized and a merge is impossible (reference parity: peft on a
    bitsandbytes-quantized base, text_modal.py:91-151)."""
    out = dict(base_layers)
    for name, ab in lora_params.items():
        out[name + "__lora_a"] = ab["a"]
        out[name + "__lora_b"] = ab["b"] * lora_cfg.scale
    return out


def merge_lora(base_layers: Dict[str, jnp.ndarray], lora_params,
               lora_cfg: LoraConfig, *, stop_base_gradient: bool = True):
    """Return a layers tree with W := W + scale * A @ B for each target.

    With stop_base_gradient=True the base weights are frozen (gradients flow
    only into A/B), matching LoRA fine-tuning; set False to fold adapters
    permanently (the reference's merge_and_unload at eval, UniBind.py:110-116).
    """
    merged = dict(base_layers)
    for name, ab in lora_params.items():
        w = base_layers[name]
        if stop_base_gradient:
            w = jax.lax.stop_gradient(w)
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        ) * lora_cfg.scale
        merged[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return merged
