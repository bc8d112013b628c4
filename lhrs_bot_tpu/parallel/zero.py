"""ZeRO-style optimizer-state sharding.

Parity with the reference's DeepSpeed ZeRO-2 partitioning (SURVEY.md §2.4 P2,
main_pretrain_stage1.py:41-63): optimizer moments must not be replicated on
every chip. Here:
  * TP-sharded params (the decoder) already give sharded moments for free —
    state leaves inherit the parameter's PartitionSpec;
  * for *replicated* params (vision tower, perceiver, norms), the moments are
    sharded over the "data" axis on the first evenly-divisible dimension —
    the ZeRO-1 equivalent (each data-parallel rank owns a slice of the
    optimizer state; pjit inserts the gathers around the update).

Implementation: optax states embed param-shaped subtrees (mu/nu/trace...).
We match state leaves to params by key-path suffix, so any optax chain works
without knowing its structure.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS
from .partition import to_named, vlm_param_specs


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        elif hasattr(entry, "name"):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def _dp_shard_spec(shape, dp: int) -> P:
    """Shard the first dim divisible by dp over the data axis."""
    for i, dim in enumerate(shape):
        if dim % dp == 0 and dim >= dp:
            return P(*([None] * i + [DATA_AXIS]))
    return P()


def opt_state_specs(opt_state_shapes: Any, params: Any, param_specs: Any,
                    mesh: Mesh) -> Any:
    """PartitionSpec tree for an optax state (from jax.eval_shape(tx.init)).

    State leaves whose key-path ends with a parameter's key-path inherit that
    parameter's spec; replicated specs are upgraded to data-axis sharding
    (ZeRO); everything else (counts, scalars) is replicated.
    """
    dp = mesh.shape[DATA_AXIS]

    param_spec_by_path: Dict[str, Any] = {}
    param_shape_by_path: Dict[str, Any] = {}
    flat_params = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_specs = jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda x: isinstance(x, P))
    for (path, leaf), spec in zip(flat_params, flat_specs):
        key = _path_str(path)
        param_spec_by_path[key] = spec
        param_shape_by_path[key] = tuple(leaf.shape)

    def spec_for(path, leaf) -> P:
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return P()
        key = _path_str(path)
        for p_key, p_spec in param_spec_by_path.items():
            if key.endswith(p_key) and param_shape_by_path[p_key] == tuple(
                    leaf.shape):
                if p_spec == P() and dp > 1:
                    return _dp_shard_spec(leaf.shape, dp)
                return p_spec
        return P()

    flat_state = jax.tree_util.tree_flatten_with_path(opt_state_shapes)[0]
    specs = [spec_for(path, leaf) for path, leaf in flat_state]
    treedef = jax.tree_util.tree_structure(opt_state_shapes)
    return jax.tree_util.tree_unflatten(treedef, specs)


def init_sharded_opt_state(tx, params, mesh: Mesh):
    """tx.init with ZeRO-sharded output placement."""
    param_specs = vlm_param_specs(params)
    state_shapes = jax.eval_shape(tx.init, params)
    specs = opt_state_specs(state_shapes, params, param_specs, mesh)
    return jax.jit(tx.init, out_shardings=to_named(mesh, specs))(params)
