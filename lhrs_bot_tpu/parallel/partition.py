"""Parameter and activation sharding rules over the ("data", "model") mesh.

Replaces the reference's NCCL/DeepSpeed parallelism (SURVEY.md §2.3/§2.4):
  P1 data parallel  → batch axis sharded on "data"; pjit inserts the gradient
    psum that DDP/ZeRO-2's reduce-scatter provided.
  P2 ZeRO sharded DP → optimizer state inherits the parameter shardings; the
    decoder's tensor sharding below already splits the 7B state across chips.
  P3 tensor parallel (new, not in the reference) → Megatron-style: attention
    q/k/v and MLP gate/up shard their output dim ("column"), o and down shard
    their input dim ("row"), so each block needs one all-reduce per sub-layer,
    inserted automatically by XLA from these specs.

Vision tower + perceiver (~0.4B) stay replicated — they are batch-bound, and
replication keeps the ViT's small per-image matmuls collective-free.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# Stacked llama layer tensors are (L, d_in, d_out) / (L, d): spec on the
# trailing two dims.
_LLAMA_LAYER_SPECS: Dict[str, P] = {
    "input_norm": P(),
    "wq": P(None, None, MODEL_AXIS),  # column: heads split
    "wk": P(None, None, MODEL_AXIS),
    "wv": P(None, None, MODEL_AXIS),
    "wo": P(None, MODEL_AXIS, None),  # row
    "post_attn_norm": P(),
    "w_gate": P(None, None, MODEL_AXIS),  # column: ffn split
    "w_up": P(None, None, MODEL_AXIS),
    "w_down": P(None, MODEL_AXIS, None),  # row
}

# LoRA A/B shard so that A @ B matches the base weight's sharding.
_LORA_SPECS: Dict[str, Dict[str, P]] = {
    "wq": {"a": P(), "b": P(None, None, MODEL_AXIS)},
    "wk": {"a": P(), "b": P(None, None, MODEL_AXIS)},
    "wv": {"a": P(), "b": P(None, None, MODEL_AXIS)},
    "wo": {"a": P(None, MODEL_AXIS, None), "b": P()},
    "w_gate": {"a": P(), "b": P(None, None, MODEL_AXIS)},
    "w_up": {"a": P(), "b": P(None, None, MODEL_AXIS)},
    "w_down": {"a": P(None, MODEL_AXIS, None), "b": P()},
}


def llama_param_specs(params_llama) -> Any:
    """PartitionSpec pytree matching init_llama_params' structure."""
    specs = {
        "embed_tokens": P(None, MODEL_AXIS),  # hidden split; gather stays local
        "layers": {k: _LLAMA_LAYER_SPECS.get(k, P())
                   for k in params_llama["layers"]},
        "final_norm": P(),
        "lm_head": P(None, MODEL_AXIS),  # vocab split
    }
    return specs


def vlm_param_specs(params) -> Any:
    """Full VLM param spec tree: decoder TP-sharded, vision replicated."""
    replicate = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    specs = {
        "vit": replicate(params["vit"]),
        "pooler": replicate(params["pooler"]),
        "llama": llama_param_specs(params["llama"]),
    }
    if "lora" in params:
        specs["lora"] = {
            name: dict(_LORA_SPECS[name]) for name in params["lora"]
        }
    return specs


def batch_specs(batch: Dict[str, Any]) -> Any:
    """Shard every batch tensor along its leading (batch) axis."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)


def kv_cache_spec(quantized: bool = False) -> Any:
    """KVCache(k, v, length): (L, B, H, S, D) — batch on data, heads on
    model. Pass quantized=True for an int8 cache (adds the scale planes;
    they shard like K/V)."""
    from ..models.llama import KVCache

    plane = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    splane = P(None, DATA_AXIS, MODEL_AXIS, None)
    return KVCache(
        k=plane, v=plane, length=P(DATA_AXIS),
        k_scale=splane if quantized else None,
        v_scale=splane if quantized else None,
    )


def llama_serving_specs(llama_params) -> Any:
    """Spec tree for a *serving* decoder param tree (possibly quantized):
    QuantizedTensor leaves get (q, scale) specs derived from the base weight's
    spec — the scale is (L, 1, out)-shaped, so it shards on the output axis
    exactly when the weight does."""
    from ..ops.quant import QuantizedTensor

    base = {
        "embed_tokens": P(None, MODEL_AXIS),
        "layers": dict(_LLAMA_LAYER_SPECS),
        "final_norm": P(),
        "lm_head": P(None, MODEL_AXIS),
    }

    def adapt(spec: P, leaf):
        if isinstance(leaf, QuantizedTensor):
            # int8 scale is (L, 1, out); nf4 absmax is (L, in/64, out).
            # Both shard on the output axis exactly when the weight does;
            # the nf4 block axis stays replicated — it is NOT always
            # divisible by the mesh (w_down: 11008/64 = 172 blocks), and
            # pjit keeps the blockwise dequant correct with a replicated
            # scale regardless.
            out_axis = spec[2] if len(spec) >= 3 else None
            scale_spec = P(None, None, out_axis)
            return QuantizedTensor(q=spec, scale=scale_spec, bits=leaf.bits)
        return spec

    def adapt_head(leaf):
        # int8 lm_head (quantized along the contraction axis d): q is
        # (d, V), scale is (1, V) — both shard on the vocab axis like the
        # bf16 head does.
        if isinstance(leaf, QuantizedTensor):
            return QuantizedTensor(q=P(None, MODEL_AXIS),
                                   scale=P(None, MODEL_AXIS),
                                   bits=leaf.bits)
        return base["lm_head"]

    out = {
        "embed_tokens": base["embed_tokens"],
        "final_norm": base["final_norm"],
        "lm_head": adapt_head(llama_params["lm_head"]),
        "layers": {
            k: adapt(base["layers"].get(k, P()), v)
            for k, v in llama_params["layers"].items()
        },
    }
    return out


def shard_llama_for_serving(mesh: Mesh, llama_params) -> Any:
    """Place a (possibly quantized) decoder param tree with TP sharding."""
    from ..ops.quant import QuantizedTensor

    specs = llama_serving_specs(llama_params)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, llama_params, specs)


def to_named(mesh: Mesh, spec_tree) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params) -> Any:
    """Place a (host-resident) param pytree onto the mesh per vlm_param_specs."""
    shardings = to_named(mesh, vlm_param_specs(params))
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
