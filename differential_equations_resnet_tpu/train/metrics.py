"""Streaming metrics with explicit reset — functional replacement for the
reference's tf.metrics.mean / tf.metrics.accuracy + manual reset-op
workaround (`training/training.py:316-354`).

Per-batch scalar contributions are computed on device inside the train/eval
step; accumulation happens here on host floats (no graph-resident local
variables needed)."""

from __future__ import annotations


class StreamingMetrics:
    """Accumulates mean loss (unweighted mean over batch losses, matching
    tf.metrics.mean over per-batch scalars) and accuracy (total correct /
    total examples, matching tf.metrics.accuracy)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._pending = []  # (loss, correct, count) — device scalars OK
        self._loss_sum = 0.0
        self._loss_batches = 0
        self._correct = 0.0
        self._count = 0.0

    def update(self, loss, correct, count) -> None:
        """Record one batch — or a stacked (K,) vector of K batches, as
        produced by the multi-step scan trainer.  Device values are accepted
        as-is — conversion (a host sync) is deferred to `results()` so the
        training loop never blocks on the device each step."""
        self._pending.append((loss, correct, count))

    def _drain(self) -> None:
        if not self._pending:
            return
        # Stack on device, then fetch each reduced scalar once: on remote/
        # tunneled backends every individual device->host read is a full
        # round trip (~30-90 ms), so the fetch count — not just the sync
        # point — must be O(1) per drain.
        import jax.numpy as jnp
        import numpy as np

        losses = jnp.concatenate([jnp.atleast_1d(p[0]) for p in self._pending])
        corrects = jnp.concatenate([jnp.atleast_1d(p[1]) for p in self._pending])
        counts = jnp.concatenate([jnp.atleast_1d(p[2]) for p in self._pending])
        host = np.asarray(jnp.stack([jnp.sum(losses), jnp.sum(corrects), jnp.sum(counts)]))
        self._loss_sum += float(host[0])
        self._loss_batches += int(losses.shape[0])
        self._correct += float(host[1])
        self._count += float(host[2])
        self._pending.clear()

    @property
    def mean_loss(self) -> float:
        self._drain()
        return self._loss_sum / max(self._loss_batches, 1)

    @property
    def accuracy(self) -> float:
        self._drain()
        return self._correct / max(self._count, 1.0)

    def results(self) -> dict:
        return {"mean_loss": self.mean_loss, "accuracy": self.accuracy}
