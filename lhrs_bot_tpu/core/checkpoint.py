"""Checkpoint I/O: orbax pytree checkpoints + reference-format interop.

Replaces the reference's checkpoint stack (SURVEY.md §5.4):
  * periodic training checkpoints with client state (trainer progress, metric
    storage, hook states) — Trainer.save_checkpoint (trainer.py:261-306);
  * max_to_keep pruning + "latest" pointer (checkpoint_hook.py:29-40,
    trainer.py:304-306) — here a latest.txt file instead of a symlink (object
    stores don't do symlinks);
  * the consolidated FINAL.pt {rgb_ckpt, other_ckpt} export and the TextLoRA/
    peft directory with detect-and-merge at load (UniBind.py:68-117) — interop
    importers live in core/torch_import.py.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    client_state: Optional[Dict] = None,
    max_to_keep: Optional[int] = None,
) -> str:
    """Write checkpoint_{step}/ under directory. Returns the path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint_{step}")
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state

    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(tmp, "state"), _to_host(tree))
    else:  # pragma: no cover
        with open(os.path.join(tmp, "state.pkl"), "wb") as fh:
            pickle.dump(_to_host(tree), fh)

    if client_state is not None:
        with open(os.path.join(tmp, "client_state.pkl"), "wb") as fh:
            pickle.dump(client_state, fh)
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump({"step": step}, fh)

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)

    with open(os.path.join(directory, "latest.txt"), "w") as fh:
        fh.write(os.path.basename(path))

    if max_to_keep:
        prune_checkpoints(directory, max_to_keep)
    return path


def prune_checkpoints(directory: str, max_to_keep: int) -> None:
    ckpts = sorted(
        (d for d in os.listdir(directory) if d.startswith("checkpoint_")),
        key=lambda d: int(d.split("_")[-1]),
    )
    for stale in ckpts[:-max_to_keep]:
        shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)


def latest_checkpoint(directory: str) -> Optional[str]:
    """auto_resume_helper parity (utils/misc.py:16-30): newest checkpoint in
    the output dir, via the latest pointer with an mtime fallback."""
    pointer = os.path.join(directory, "latest.txt")
    if os.path.exists(pointer):
        with open(pointer) as fh:
            name = fh.read().strip()
        path = os.path.join(directory, name)
        if os.path.exists(path):
            return path
    if not os.path.isdir(directory):
        return None
    ckpts = [
        os.path.join(directory, d)
        for d in os.listdir(directory)
        if d.startswith("checkpoint_")
    ]
    return max(ckpts, key=os.path.getmtime) if ckpts else None


def load_checkpoint(path: str, template: Any = None) -> Dict[str, Any]:
    """Returns {"params", ["opt_state"], ["client_state"], "step"}."""
    out: Dict[str, Any] = {}
    state_dir = os.path.join(path, "state")
    if _HAS_ORBAX and os.path.exists(state_dir):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(
            state_dir,
            item=_to_host(template) if template is not None else None)
        out.update(restored)
    else:  # pragma: no cover
        with open(os.path.join(path, "state.pkl"), "rb") as fh:
            out.update(pickle.load(fh))
    cs = os.path.join(path, "client_state.pkl")
    if os.path.exists(cs):
        with open(cs, "rb") as fh:
            out["client_state"] = pickle.load(fh)
    with open(os.path.join(path, "meta.json")) as fh:
        out["step"] = json.load(fh)["step"]
    return out
