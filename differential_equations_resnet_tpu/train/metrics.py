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
        self._loss_sum = 0.0
        self._loss_batches = 0
        self._correct = 0.0
        self._count = 0.0

    def update(self, loss: float, correct: float, count: float) -> None:
        self._loss_sum += float(loss)
        self._loss_batches += 1
        self._correct += float(correct)
        self._count += float(count)

    @property
    def mean_loss(self) -> float:
        return self._loss_sum / max(self._loss_batches, 1)

    @property
    def accuracy(self) -> float:
        return self._correct / max(self._count, 1.0)

    def results(self) -> dict:
        return {"mean_loss": self.mean_loss, "accuracy": self.accuracy}
