"""Checkpoint / resume.

Replaces the reference's three mechanisms (`tf.train.Saver` / tf.saved_model
with metric-encoded directory names, Keras .h5 weights, pickle surgery —
SURVEY.md section 5.4) with Orbax checkpoints of the full TrainState pytree
(params + optimizer slots + BN state + step), so resume restores the Adam
moments too (the reference's .h5 path silently did not).  A pickle backend is
kept for portability of small runs and for weight-surgery interop.
"""

from __future__ import annotations

import json
import os
import pickle
import re
from typing import Any, Optional

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _layout_hint(saved_treedef: str, target_treedef: str) -> str:
    """A structure-drift error usually means a genuinely different model —
    except when the trees differ (only) in the antisymmetric-conv parameter
    layout (packed `Antisym3x3Params` vs dense-lower `Antisym3x3DenseParams`,
    e.g. a bottleneck checkpoint saved before the family switched layouts).
    That conversion is bit-exact and mechanical, so point the user at it."""
    saved = ("Antisym3x3Params" in saved_treedef,
             "Antisym3x3DenseParams" in saved_treedef)
    target = ("Antisym3x3Params" in target_treedef,
              "Antisym3x3DenseParams" in target_treedef)
    # Only the exact packed<->dense swap gets the hint: any other mismatch
    # (e.g. a regular-conv checkpoint into an antisym target) is a genuinely
    # different model and the converter would not apply.
    if {saved, target} == {(True, False), (False, True)}:
        return (
            "\nThe structures differ in the antisymmetric-conv parameter "
            "layout (packed Antisym3x3Params vs dense-lower "
            "Antisym3x3DenseParams).  The conversion is bit-exact: load the "
            "checkpoint into a model of the saved layout (or unpickle it) "
            "and run the params through "
            "differential_equations_resnet_tpu.utils.weight_utils."
            "convert_antisym_layout(params, to='dense'|'packed')."
        )
    return ""


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
            if re.search(r"step-\d+", d) and not d.endswith(".meta.json")
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

    def save(
        self,
        state: Any,
        step: int,
        name: str = "",
        tags=(),
        metrics=None,
        preserve_shardings: bool = False,
    ) -> str:
        """``preserve_shardings=True`` (orbax backend only) hands the live
        `jax.Array` leaves to Orbax so each shard is written from the device
        holding it — no host-side gather of the full state.  This is the
        scale path: a TP/DP-sharded TrainState larger than host memory
        checkpoints shard-wise, and on a multi-host mesh every process
        writes only its addressable shards (call `save` on ALL processes
        with a shared filesystem `base_dir` — with multiple processes this
        path is a collective and ends in a cross-process barrier).  The
        default (False) gathers to NumPy first — right for single-host
        runs and for pickle portability; on a multi-host mesh it is a
        single-writer save: call it from process 0 only (it takes no
        barrier, so the usual `if jax.process_index() == 0:` guard is
        safe)."""
        ckpt_name = self.checkpoint_name(step, name, tags, metrics)
        path = self._path(ckpt_name)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            checkpointer = ocp.StandardCheckpointer()
            payload = state if preserve_shardings else _to_numpy(state)
            checkpointer.save(path, payload, force=True)
            checkpointer.wait_until_finished()
        else:
            if preserve_shardings:
                raise ValueError(
                    "preserve_shardings=True requires the 'orbax' backend "
                    "(pickle serializes host arrays only)."
                )
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "state.pkl"), "wb") as f:
                pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)
        # Sidecar metadata: machine-readable step + monitored metrics (so
        # resume restores the best-metric watermark from the payload, not by
        # regex-parsing the %.4f-rounded directory name) and the treedef
        # fingerprint for structure-drift detection on restore.  On a
        # multi-host mesh `save` runs on EVERY process (each writes its
        # addressable shards through Orbax), but the sidecar and the
        # garbage collection are host-side single-writer operations on the
        # shared filesystem — concurrent writers would race the json write
        # and double-rmtree stale checkpoints — so only process 0 performs
        # them.
        if jax.process_index() == 0:
            meta = {
                "step": int(step),
                "metrics": {k: float(v) for k, v in (metrics or {}).items()},
                "treedef": str(jax.tree.structure(state)),
            }
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)
            self._garbage_collect()
        # Multi-host preserve_shardings: `save` is a COLLECTIVE (every
        # process writes its addressable shards, so every process is in
        # here) — no process returns until the sidecar exists and garbage
        # collection finished, so a caller that immediately `restore`s /
        # `read_meta`s / `latest`s on any process never observes a
        # half-published checkpoint (missing .meta.json would silently
        # skip the treedef structure-drift guard) and never picks a stale
        # directory that process 0 is mid-rmtree.  Callers do NOT need
        # their own barrier around save().  The host-gathered default and
        # the pickle backend are SINGLE-WRITER saves (call from process 0
        # only) — a barrier there would deadlock the
        # `if jax.process_index() == 0: save(...)` pattern, since the
        # other processes never enter it.
        if preserve_shardings and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                f"deqres_checkpoint_save:{ckpt_name}"
            )
        return path

    def read_meta(self, path: str) -> Optional[dict]:
        """Load the sidecar metadata for a checkpoint path (None for legacy
        checkpoints saved before metadata existed)."""
        meta_path = path.rstrip("/") + ".meta.json"
        if not os.path.isfile(meta_path):
            return None
        with open(meta_path) as f:
            return json.load(f)

    def restore(
        self,
        target: Any,
        path: Optional[str] = None,
        preserve_shardings: bool = False,
    ) -> Any:
        """Restore into the structure of ``target`` (an existing TrainState
        used as the abstract template).  ``path`` defaults to the latest.

        ``preserve_shardings=True``: leaves whose ``target`` counterpart is a
        `jax.Array` are restored DIRECTLY onto that array's devices with its
        sharding — Orbax reads each shard straight into the right device
        buffer (no full-array host materialization; on multi-host meshes
        each process reads only its addressable shards), and the pickle
        backend falls back to a `device_put` per leaf.  The default (False)
        returns host arrays, matching the historical contract.

        Raises ValueError when the checkpoint's pytree structure does not
        match ``target`` — a silent flat-leaf-order unflatten would otherwise
        mis-assign leaves across e.g. an optimizer or model-config change."""
        if path is None:
            name = self.latest()
            if name is None:
                raise FileNotFoundError(f"No checkpoints in {self.base_dir}.")
            path = self._path(name)
        target_treedef = jax.tree.structure(target)
        meta = self.read_meta(path)
        if meta is not None and meta.get("treedef") not in (
            None, str(target_treedef)
        ):
            raise ValueError(
                f"Checkpoint {path} was saved with a different pytree "
                f"structure than the restore target.\n  saved:  "
                f"{meta['treedef']}\n  target: {target_treedef}"
                + _layout_hint(meta["treedef"], str(target_treedef))
            )
        if os.path.isfile(os.path.join(path, "state.pkl")):
            with open(os.path.join(path, "state.pkl"), "rb") as f:
                restored = pickle.load(f)
            restored_treedef = jax.tree.structure(restored)
            if restored_treedef != target_treedef:
                raise ValueError(
                    f"Checkpoint {path} pytree structure does not match the "
                    f"restore target.\n  saved:  {restored_treedef}\n  "
                    f"target: {target_treedef}"
                    + _layout_hint(str(restored_treedef), str(target_treedef))
                )
        else:
            import orbax.checkpoint as ocp

            # Orbax validates the stored tree against this abstract template
            # itself and errors on mismatch.  With preserve_shardings, the
            # template carries each target leaf's sharding so Orbax loads
            # shard-by-shard onto the owning devices.
            checkpointer = ocp.StandardCheckpointer()

            def _abstract(x):
                arr = x if hasattr(x, "dtype") else np.asarray(x)
                sharding = (
                    x.sharding
                    if preserve_shardings and isinstance(x, jax.Array)
                    else None
                )
                return jax.ShapeDtypeStruct(
                    arr.shape, arr.dtype, sharding=sharding
                )

            abstract = jax.tree.map(_abstract, target)
            restored = checkpointer.restore(path, abstract)
        leaves = jax.tree.leaves(restored)
        restored = jax.tree.unflatten(target_treedef, leaves)
        if preserve_shardings and os.path.isfile(os.path.join(path, "state.pkl")):
            # Pickle backend: place each host leaf onto its target sharding.
            restored = jax.tree.map(
                lambda t, r: jax.device_put(r, t.sharding)
                if isinstance(t, jax.Array) else r,
                target, restored,
            )
        return restored

    def _garbage_collect(self) -> None:
        if self.max_to_keep is None:
            return
        entries = self.list_checkpoints()
        entries.sort(key=lambda d: int(re.search(r"step-(\d+)", d).group(1)))
        for stale in entries[: max(0, len(entries) - self.max_to_keep)]:
            import shutil

            shutil.rmtree(self._path(stale), ignore_errors=True)
            try:
                os.unlink(self._path(stale) + ".meta.json")
            except OSError:
                pass
