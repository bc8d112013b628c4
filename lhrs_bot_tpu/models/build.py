"""Model factory.

Parity with the reference factory (lhrs/models/build.py:9-22):
build_model(config) returns the composed VLM spec + initialized params.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .vlm import VLMConfig, init_vlm_params


def build_model(
    config,
    *,
    rng: Optional[jax.Array] = None,
    init_params: bool = True,
    dtype=jnp.float32,
) -> Tuple[VLMConfig, Optional[dict]]:
    """config: the merged YAML ConfigDict (same schema as Config/*.yaml)."""
    cfg = VLMConfig.from_config_dict(config)
    params = None
    if init_params:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = init_vlm_params(rng, cfg, dtype)
    return cfg, params
