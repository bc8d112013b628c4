"""Host-side distributed utilities.

Parity with the reference's distribute.py surface (SURVEY.md §2.3): rank
helpers, host-object all-gather, metric dict reduction, seed sync, barriers —
implemented over jax.distributed / multihost_utils instead of NCCL+gloo
side-groups. On a single process these degrade to no-ops.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def init_distributed(**kwargs) -> None:
    """Multi-host init (replaces init_process_group, distribute.py:525-573).
    Safe to call when single-process (no coordinator configured → no-op)."""
    import os

    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or kwargs:
        try:
            jax.distributed.initialize(**kwargs)
        except Exception:  # pragma: no cover — already initialized
            pass


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def is_distributed() -> bool:
    return jax.process_count() > 1


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_object(obj: Any) -> List[Any]:
    """Gather arbitrary picklables from every process (replaces the cached
    gloo-subgroup gather, distribute.py:236-339)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the global max length, exchange lengths first
    n = np.asarray([payload.size], np.int32)
    all_n = multihost_utils.process_allgather(n).reshape(-1)
    width = int(all_n.max())
    padded = np.zeros((width,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(all_n[i])].tobytes())
            for i in range(gathered.shape[0])]


def reduce_dict(metrics: Dict[str, float], average: bool = True
                ) -> Dict[str, float]:
    """Mean-reduce a scalar metric dict across processes
    (distribute.py:342-370)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    allv = multihost_utils.process_allgather(vec)
    red = allv.mean(axis=0) if average else allv.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, red)}


def sync_random_seed(seed: int) -> int:
    """Broadcast process 0's seed (distribute.py:445-477)."""
    if jax.process_count() == 1:
        return seed
    from jax.experimental import multihost_utils

    arr = multihost_utils.broadcast_one_to_all(
        np.asarray([seed], np.int32))
    return int(arr[0])
