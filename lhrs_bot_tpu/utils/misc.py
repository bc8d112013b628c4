"""Misc utilities.

Parity with lhrs/CustomTrainer/utils/misc.py: auto_resume_helper (:16-30),
set_random_seed (:97), str2bool (:131), collect_env (:46-94 — adapted to
report the JAX/TPU environment instead of CUDA).
"""

from __future__ import annotations

import argparse
import os
import platform
import random
import sys
from typing import Optional

import numpy as np


def auto_resume_helper(output_dir: str) -> Optional[str]:
    """Newest checkpoint dir under output/checkpoints (mtime-latest parity)."""
    from ..core.checkpoint import latest_checkpoint

    ckpt_dir = os.path.join(output_dir, "checkpoints")
    return latest_checkpoint(ckpt_dir)


def set_random_seed(seed: int, rank: int = 0) -> None:
    random.seed(seed + rank)
    np.random.seed(seed + rank)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def collect_env() -> str:
    """Platform / JAX / device summary printed at startup."""
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
        f"numpy: {np.__version__}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"backend: {jax.default_backend()}")
        lines.append(
            f"devices: {[str(d) for d in jax.devices()]} "
            f"(process {jax.process_index()}/{jax.process_count()})")
    except Exception as exc:  # pragma: no cover
        lines.append(f"jax: unavailable ({exc})")
    return "\n".join(lines)
