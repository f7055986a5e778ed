"""Checkpoint / resume.

Replaces the reference's three mechanisms (`tf.train.Saver` / tf.saved_model
with metric-encoded directory names, Keras .h5 weights, pickle surgery —
SURVEY.md section 5.4) with Orbax checkpoints of the full TrainState pytree
(params + optimizer slots + BN state + step), so resume restores the Adam
moments too (the reference's .h5 path silently did not).  A pickle backend is
kept for portability of small runs and for weight-surgery interop.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Checkpointer:
    """Save/restore TrainState pytrees under metric-encoded directory names
    (parity with the reference `Training.save`, training/training.py:781-858,
    which embeds tags + monitored metrics in the checkpoint name)."""

    def __init__(self, base_dir: str, backend: str = "orbax", max_to_keep: int = 5):
        if backend not in ("orbax", "pickle"):
            raise ValueError(f"Unknown checkpoint backend {backend!r}.")
        self.base_dir = os.path.abspath(base_dir)
        self.backend = backend
        self.max_to_keep = max_to_keep
        os.makedirs(self.base_dir, exist_ok=True)

    # -- naming -------------------------------------------------------------

    def checkpoint_name(self, step: int, name: str = "", tags=(), metrics=None) -> str:
        parts = [p for p in ([name] if name else [])]
        parts += list(tags or [])
        parts.append(f"step-{int(step):08d}")
        for key, value in (metrics or {}).items():
            parts.append(f"{key}-{value:.4f}")
        return "_".join(parts)

    def _path(self, checkpoint_name: str) -> str:
        return os.path.join(self.base_dir, checkpoint_name)

    def list_checkpoints(self):
        if not os.path.isdir(self.base_dir):
            return []
        entries = [
            d for d in sorted(os.listdir(self.base_dir))
            if re.search(r"step-\d+", d)
        ]
        return entries

    def latest(self) -> Optional[str]:
        entries = self.list_checkpoints()
        if not entries:
            return None
        return max(
            entries, key=lambda d: int(re.search(r"step-(\d+)", d).group(1))
        )

    # -- save/restore ---------------------------------------------------------

    def save(self, state: Any, step: int, name: str = "", tags=(), metrics=None) -> str:
        ckpt_name = self.checkpoint_name(step, name, tags, metrics)
        path = self._path(ckpt_name)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            checkpointer = ocp.StandardCheckpointer()
            checkpointer.save(path, _to_numpy(state), force=True)
            checkpointer.wait_until_finished()
        else:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "state.pkl"), "wb") as f:
                pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)
        self._garbage_collect()
        return path

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        """Restore into the structure of ``target`` (an existing TrainState
        used as the abstract template).  ``path`` defaults to the latest."""
        if path is None:
            name = self.latest()
            if name is None:
                raise FileNotFoundError(f"No checkpoints in {self.base_dir}.")
            path = self._path(name)
        if os.path.isfile(os.path.join(path, "state.pkl")):
            with open(os.path.join(path, "state.pkl"), "rb") as f:
                flat = pickle.load(f)
            restored = flat
        else:
            import orbax.checkpoint as ocp

            checkpointer = ocp.StandardCheckpointer()
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), _to_numpy(target)
            )
            restored = checkpointer.restore(path, abstract)
        leaves, _ = jax.tree.flatten(restored)
        _, treedef = jax.tree.flatten(target)
        return jax.tree.unflatten(treedef, leaves)

    def _garbage_collect(self) -> None:
        if self.max_to_keep is None:
            return
        entries = self.list_checkpoints()
        entries.sort(key=lambda d: int(re.search(r"step-(\d+)", d).group(1)))
        for stale in entries[: max(0, len(entries) - self.max_to_keep)]:
            import shutil

            shutil.rmtree(self._path(stale), ignore_errors=True)
