"""Device mesh construction over ICI/DCN.

Replaces the reference's NCCL process-group init
(lhrs/CustomTrainer/utils/distribute.py:525-573) with a jax.sharding.Mesh.
Axis convention:
  "data"  — batch (data parallel; gradients mean-reduced by pjit-inserted psum)
  "model" — tensor parallel (attention heads / MLP hidden dim of the decoder)

On a v5e-8 slice both axes ride the ICI torus. Multi-slice deployments put the
"data" axis on DCN by listing slices first in the device array.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh.

    Defaults: all devices on the model axis when a 7B decode fits the bill
    (tp=n), otherwise caller passes explicit dp/tp. dp*tp must equal the
    device count.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp  # type: ignore[operator]
    elif tp is None:
        tp = n // dp
    if dp * tp > n:
        raise ValueError(f"dp({dp}) * tp({tp}) exceeds device count ({n})")
    arr = np.asarray(devs[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DATA_AXIS]
    if global_batch % dp:
        raise ValueError(f"global batch {global_batch} not divisible by dp={dp}")
    return global_batch // dp


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
