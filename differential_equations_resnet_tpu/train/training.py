"""The training harness: the user-facing `Training` class.

Rebuild of the reference's TF1 graph-mode trainer
(`training/training.py:34-876`) on the functional core of `train_step.py`:
one donated jitted step per iteration instead of `sess.run(feed_dict)`,
streaming metrics with explicit reset, per-layer gradient-norm CSV +
TensorBoard-style summaries, periodic evaluation, best-metric-gated Orbax
checkpointing (with the reference's 'accuracry'-typo bug fixed so accuracy
monitoring actually works — reference `:637,667`), and a working `predict`
(the reference's referenced a nonexistent `self.image_input`, `:752-779`).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.data.pipeline import (
    NumpyDataset,
    create_dataset_from_arrays,
)
from differential_equations_resnet_tpu.parallel.mesh import shard_batch
from differential_equations_resnet_tpu.train.checkpoint import Checkpointer
from differential_equations_resnet_tpu.train.metrics import StreamingMetrics
from differential_equations_resnet_tpu.train.telemetry import (
    CsvLogger,
    SummaryWriter,
    gradient_metric_names,
)
from differential_equations_resnet_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_adam,
    make_eval_step,
    make_predict_step,
    make_train_step,
)


class _ProducerStopped(Exception):
    """Internal: the dispatch loop asked the staging producer to exit."""


class Training:
    """End-to-end trainer.

    Data can be supplied either as ready-made batched `NumpyDataset`s
    (elements = (images, labels) batches) or as in-memory arrays, mirroring
    the reference's 'tfrecord' / 'arrays' dataset modes
    (`training/training.py:237-281`).
    """

    def __init__(
        self,
        model,
        train_dataset: Optional[NumpyDataset] = None,
        val_dataset: Optional[NumpyDataset] = None,
        train_features: Optional[np.ndarray] = None,
        train_labels: Optional[np.ndarray] = None,
        val_features: Optional[np.ndarray] = None,
        val_labels: Optional[np.ndarray] = None,
        batch_size: int = 32,
        optimizer=None,
        global_step: int = 0,
        record_summaries: bool = True,
        summaries: Sequence[str] = ("mean_gradient_norms",),
        summaries_dir: Optional[str] = None,
        summaries_name: Optional[str] = None,
        csv_logger_dir: Optional[str] = None,
        csv_logger_name: Optional[str] = None,
        mesh=None,
        seed: int = 0,
        data_seed: Optional[int] = 0,
        jit_augment=None,
        accum_steps: int = 1,
    ):
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        # Gradient accumulation: batch_size stays the EFFECTIVE batch (the
        # optimizer sees one averaged update per batch_size examples, and
        # all epoch/step accounting is in effective batches); accum_steps
        # only caps peak activation memory at batch_size/accum_steps
        # examples.  See train_step._build_step_fn for the exactness
        # contract (identical numerics to the monolithic step for BN-free
        # models; with batch norm each microbatch normalizes by its own
        # statistics, so accumulation approximates the monolithic step).
        self.accum_steps = int(accum_steps)
        if self.accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {accum_steps}.")
        if batch_size % self.accum_steps:
            raise ValueError(
                f"accum_steps ({accum_steps}) must divide batch_size "
                f"({batch_size}): accumulation averages EQUAL microbatches "
                "so it reproduces the monolithic step exactly."
            )
        self.record_summaries = record_summaries
        self.summaries = tuple(summaries)

        # -- data ------------------------------------------------------------
        # Example counts (when known) let evaluate() default to one full pass.
        self._num_train_examples = (
            len(train_features) if train_features is not None else None
        )
        self._num_val_examples = (
            len(val_features) if val_features is not None else None
        )
        if train_dataset is None and train_features is not None:
            train_dataset = create_dataset_from_arrays(
                train_features, train_labels, batch_size,
                shuffle=True, repeat=True, drop_remainder=True, seed=data_seed,
            )
        if val_dataset is None and val_features is not None:
            val_dataset = create_dataset_from_arrays(
                val_features, val_labels, batch_size,
                shuffle=False, repeat=True, drop_remainder=False, seed=data_seed,
            )
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self._train_iter: Optional[Iterator] = (
            iter(train_dataset) if train_dataset is not None else None
        )
        self._val_iter: Optional[Iterator] = (
            iter(val_dataset) if val_dataset is not None else None
        )

        # -- functional core ---------------------------------------------------
        self.tx = optimizer if optimizer is not None else make_adam()
        self.state: TrainState = create_train_state(model, jax.random.key(seed), self.tx)
        if global_step:
            self.state = self.state._replace(step=jnp.asarray(global_step, jnp.int32))
        # Host mirror of the device step counter: reading state.step would
        # block on the in-flight step (a device round trip per iteration).
        self._host_step = int(global_step)
        self._train_step = make_train_step(
            model, self.tx, mesh=mesh,
            with_gradient_metrics="mean_gradient_norms" in self.summaries,
            accum_steps=self.accum_steps,
        )
        self._eval_step = make_eval_step(model, mesh=mesh)
        self._predict_step = make_predict_step(model, mesh=mesh)
        # Pack per-step telemetry into one small device array so the train
        # loop never reads from the device: rows are fetched in a single
        # device_get per epoch.  Mid-stream host reads cost ~30-90 ms each on
        # remote/tunneled TPU backends — per-step fetching is the difference
        # between ~4 and ~4000 steps/s.
        self._pack_row = jax.jit(
            lambda m, g: jnp.concatenate(
                [m["loss"][None], m["correct"][None], m["count"][None], g]
            )
        )
        # Stacked variant for the multi-step scan path: (K,) metrics +
        # (K, W) grad norms -> (K, 3 + W) telemetry rows.
        self._pack_rows = jax.jit(
            lambda m, g: jnp.concatenate(
                [m["loss"][:, None], m["correct"][:, None], m["count"][:, None], g],
                axis=1,
            )
        )
        self._multi_steps: dict = {}  # scan_steps K -> compiled K-step trainer
        self._multi_evals: dict = {}  # K -> compiled K-batch eval
        # Device-resident mode (train(device_data=True)): the raw train
        # arrays, their one-time device upload, the compiled whole-epoch
        # trainer (one jit wrapper — the scan length specializes on
        # lrs.shape), the in-jit augmentation, and the RNG stream driving
        # shuffle + augmentation.
        self._train_arrays = (
            (train_features, train_labels)
            if train_features is not None else None
        )
        self._val_arrays = (
            (val_features, val_labels) if val_features is not None else None
        )
        self._device_train = None
        self._device_val = None
        self._device_epoch = None
        self._device_eval_fns: dict = {}  # source name -> compiled full-pass eval
        self._jit_augment = jit_augment
        self._data_key = jax.random.key(data_seed if data_seed is not None else 0)

        # -- metrics / logging -------------------------------------------------
        self.train_metrics = StreamingMetrics()
        self.eval_metrics = StreamingMetrics()
        self.gradient_names = gradient_metric_names(model.config)
        self.best_metrics = {"loss": np.inf, "accuracy": 0.0}
        self.history: dict = {"train": [], "eval": []}

        self._summary_writer = None
        self._eval_summary_writer = None
        if record_summaries and summaries_dir:
            import os

            run = summaries_name or model.name
            self._summary_writer = SummaryWriter(
                os.path.join(summaries_dir, run, "train")
            )
            self._eval_summary_writer = SummaryWriter(
                os.path.join(summaries_dir, run, "eval")
            )
        self._train_csv = None
        self._eval_csv = None
        if record_summaries and csv_logger_dir:
            import os

            stamp = time.strftime("%Y%m%d-%H%M%S")
            base = f"{csv_logger_name or 'history'}_{stamp}"
            self._train_csv = CsvLogger(
                os.path.join(csv_logger_dir, base + "_training.csv"),
                ["global_step", "mean_loss", "accuracy"] + self.gradient_names,
            )
            self._eval_csv = CsvLogger(
                os.path.join(csv_logger_dir, base + "_evaluation.csv"),
                ["global_step", "mean_loss", "accuracy"],
            )

    # -- helpers ---------------------------------------------------------------

    @property
    def global_step(self) -> int:
        return self._host_step

    def _put_replicated(self, array):
        """Upload a device-resident dataset array once.  On a mesh it is
        committed with the replicated NamedSharding the compiled epoch/eval
        expects — a bare device_put would leave a single-device array that
        multi-host meshes reject and single-host meshes re-broadcast on
        every dispatch."""
        if self.mesh is None:
            return jax.device_put(array)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(array, NamedSharding(self.mesh, P()))

    def _device_batch(self, batch):
        images, labels = batch
        if self.mesh is not None:
            return shard_batch(self.mesh, (images, labels))
        return images, labels

    # -- train -------------------------------------------------------------------

    def train(
        self,
        epochs: int,
        steps_per_epoch: int,
        learning_rate_schedule: Callable[[int], float],
        eval_dataset: str = "val",
        eval_frequency: Optional[int] = 1,
        eval_steps: Optional[int] = None,
        save_during_training: bool = False,
        save_dir: Optional[str] = None,
        save_best_only: bool = True,
        save_tags: Sequence[str] = ("default",),
        save_name: str = "",
        save_frequency: int = 5,
        saver: str = "orbax",
        monitor: str = "loss",
        summaries_frequency: int = 10,
        scan_steps: int = 0,
        device_data: bool = False,
        profile_dir: Optional[str] = None,
        profile_epoch: int = 1,
        verbose: bool = True,
    ) -> dict:
        """Run the training loop (argument surface mirrors the reference
        `Training.train`, training/training.py:473-488).

        `eval_dataset` is 'val' (default) or 'train' (the reference's
        default: evaluate on a fresh pass of the training set); invalid
        values raise.  `eval_steps=None` defaults to one full pass when the
        example count is known — in `device_data` mode that full pass runs
        as a single dispatch (`make_device_eval`).

        `scan_steps=K > 1` runs K steps per dispatch through one compiled
        `lax.scan` (see `make_multi_step`): a single host<->device round trip
        per K steps, with identical numerics and per-step telemetry.  This is
        the recommended mode on remote/tunneled TPU backends; any epoch
        remainder (steps_per_epoch % K) runs through the single-step path.

        `profile_dir` captures a `jax.profiler` device trace of epoch
        `profile_epoch` (TensorBoard-viewable) — the reference had only
        wall-clock prints (SURVEY.md section 5.1)."""
        if self._train_iter is None:
            raise ValueError("No training dataset was provided.")
        if monitor not in ("loss", "accuracy"):
            raise ValueError("`monitor` must be 'loss' or 'accuracy'.")
        if eval_dataset not in ("train", "val"):
            # Hard-validate like the reference (training/training.py:546-547):
            # a typo here must not silently disable evaluation.
            raise ValueError(
                f"`eval_dataset` must be 'train' or 'val', got {eval_dataset!r}."
            )
        checkpointer = None
        if save_during_training:
            if save_dir is None:
                raise ValueError("save_during_training=True requires save_dir.")
            checkpointer = Checkpointer(save_dir, backend=saver)

        scan_k = int(scan_steps) if scan_steps and scan_steps > 1 else 0
        if scan_k:
            if scan_k not in self._multi_steps:
                from differential_equations_resnet_tpu.train.train_step import (
                    make_multi_step,
                )

                self._multi_steps[scan_k] = make_multi_step(
                    self.model, self.tx, mesh=self.mesh,
                    with_gradient_metrics="mean_gradient_norms" in self.summaries,
                    accum_steps=self.accum_steps,
                )
            multi_step = self._multi_steps[scan_k]

        if self._jit_augment is not None and not device_data:
            raise ValueError(
                "jit_augment runs inside the device-resident epoch only; "
                "call train(device_data=True), or use the host preprocessors "
                "(data/preprocessors.py) for the streaming paths.  Silently "
                "training unaugmented would corrupt the experiment."
            )
        if steps_per_epoch < 1:
            raise ValueError(
                f"steps_per_epoch must be >= 1, got {steps_per_epoch} "
                "(a batch size larger than the dataset reduces a "
                "device-resident epoch to zero steps)."
            )
        if device_data:
            # Whole-epoch device residency (make_device_epoch docstring):
            # the dataset is uploaded once, and each epoch is ONE dispatch
            # covering shuffle, gather, optional in-jit augmentation, every
            # step, and the stacked telemetry.
            if self._train_arrays is None:
                raise ValueError(
                    "device_data=True requires in-memory train arrays "
                    "(Training(train_features=..., train_labels=...))."
                )
            feats, labs = self._train_arrays
            if steps_per_epoch * self.batch_size > len(feats):
                raise ValueError(
                    f"device_data=True draws batches without replacement: "
                    f"steps_per_epoch*batch_size "
                    f"({steps_per_epoch}*{self.batch_size}) exceeds the "
                    f"{len(feats)} training examples."
                )
            if self._device_train is None:
                self._device_train = (
                    self._put_replicated(feats),
                    self._put_replicated(np.asarray(labs)),
                )
            if self._device_epoch is None:
                from differential_equations_resnet_tpu.train.train_step import (
                    make_device_epoch,
                )

                # One jit wrapper serves every steps_per_epoch — the scan
                # length comes from lrs.shape, which jit specializes on.
                self._device_epoch = make_device_epoch(
                    self.model, self.tx, self.batch_size, mesh=self.mesh,
                    with_gradient_metrics=(
                        "mean_gradient_norms" in self.summaries
                    ),
                    augment=self._jit_augment,
                    accum_steps=self.accum_steps,
                )
            device_epoch = self._device_epoch

        for epoch in range(1, epochs + 1):
            profiling = profile_dir is not None and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)
            self.train_metrics.reset()
            epoch_start = time.time()
            pending_rows = []   # device arrays: [loss, correct, count, *norms]
            row_chunks = []     # device (chunk, width) stacks
            chunk = 128         # fixed so the on-device stack compiles once
            lrs = []
            epoch_first_step = self.global_step + 1
            steps_done = 0
            if device_data:
                # One dispatch per epoch; shuffle/augment keys fold the
                # global step into the data seed for reproducible streams.
                lrs_np = np.asarray(
                    [float(learning_rate_schedule(self.global_step + i))
                     for i in range(steps_per_epoch)],
                    np.float32,
                )
                key = jax.random.fold_in(self._data_key, self.global_step)
                self.state, metrics, grad_norms = device_epoch(
                    self.state, self._device_train[0], self._device_train[1],
                    key, jnp.asarray(lrs_np),
                )
                self._host_step += steps_per_epoch
                steps_done = steps_per_epoch
                if self.record_summaries:
                    row_chunks.append(self._pack_rows(metrics, grad_norms))
                    lrs.extend(float(v) for v in lrs_np)
                else:
                    self.train_metrics.update(
                        metrics["loss"], metrics["correct"], metrics["count"]
                    )
            else:
                # Batch assembly + host->device transfer run on a daemon producer
                # thread, double-buffered through a bounded queue, so the dispatch
                # loop never waits on host staging.  At headline throughput the
                # host work (K-batch gather + stack + tunnel transfer) is
                # comparable to the device's whole K-step compute; serializing
                # them costs ~1/3 of end-to-end throughput (docs/RESULTS.md §1).
                # LR values are computed ahead from a local step counter — steps
                # are strictly sequential, so they match dispatch-time values.
                stage_q: queue.Queue = queue.Queue(maxsize=2)
                # If the dispatch loop dies mid-epoch (checkpoint I/O error, user
                # interrupt), the producer must not stay blocked on the full
                # queue holding its position in self._train_iter — a later
                # train() call would spawn a second producer over the same
                # iterator.  stop_event + a timeout-put lets it exit promptly.
                stop_event = threading.Event()

                def _put(item) -> None:
                    while not stop_event.is_set():
                        try:
                            stage_q.put(item, timeout=0.2)
                            return
                        except queue.Full:
                            continue
                    raise _ProducerStopped()

                def _producer(first_step: int, total: int) -> None:
                    try:
                        step, remaining = first_step, total
                        while remaining > 0:
                            if scan_k and remaining >= scan_k:
                                # K steps in one dispatch (make_multi_step).
                                batches = [
                                    next(self._train_iter) for _ in range(scan_k)
                                ]
                                if len({b[0].shape for b in batches}) != 1:
                                    # Ragged chunk (e.g. a short epoch-boundary
                                    # batch from a dataset without drop_remainder):
                                    # stage each batch for the single-step path
                                    # instead of np.stack-crashing.
                                    for images, labels in batches:
                                        images, labels = self._device_batch(
                                            (images, labels)
                                        )
                                        lr = float(learning_rate_schedule(step))
                                        _put(("single", images, labels, lr))
                                        step += 1
                                        remaining -= 1
                                    continue
                                k_lrs = np.asarray(
                                    [float(learning_rate_schedule(step + i))
                                     for i in range(scan_k)],
                                    np.float32,
                                )
                                images = np.stack([b[0] for b in batches])
                                labels = np.stack([b[1] for b in batches])
                                if self.mesh is not None:
                                    from jax.sharding import (
                                        NamedSharding, PartitionSpec as P,
                                    )

                                    sh = NamedSharding(self.mesh, P(None, "data"))
                                    images = jax.device_put(images, sh)
                                    labels = jax.device_put(labels, sh)
                                _put(("chunk", images, labels, k_lrs))
                                step += scan_k
                                remaining -= scan_k
                            else:
                                images, labels = self._device_batch(
                                    next(self._train_iter)
                                )
                                lr = float(learning_rate_schedule(step))
                                _put(("single", images, labels, lr))
                                step += 1
                                remaining -= 1
                    except _ProducerStopped:
                        pass  # consumer asked us to exit; nothing to report
                    except BaseException as e:  # propagate to the dispatch loop
                        try:
                            _put(("error", e))
                        except _ProducerStopped:
                            pass
                    else:
                        try:
                            _put(("end",))
                        except _ProducerStopped:
                            pass

                producer = threading.Thread(
                    target=_producer, args=(self.global_step, steps_per_epoch),
                    daemon=True, name="deqres-staging-producer",
                )
                producer.start()
                try:
                    while True:
                        item = stage_q.get()
                        kind = item[0]
                        if kind == "error":
                            raise item[1]
                        if kind == "end":
                            break
                        if kind == "chunk":
                            _, images, labels, k_lrs = item
                            self.state, metrics, grad_norms = multi_step(
                                self.state, images, labels, jnp.asarray(k_lrs)
                            )
                            self._host_step += scan_k
                            steps_done += scan_k
                            if self.record_summaries:
                                if pending_rows:  # keep telemetry rows step-ordered
                                    row_chunks.append(jnp.stack(pending_rows))
                                    pending_rows = []
                                row_chunks.append(
                                    self._pack_rows(metrics, grad_norms)
                                )
                                lrs.extend(float(v) for v in k_lrs)
                            else:
                                self.train_metrics.update(
                                    metrics["loss"], metrics["correct"],
                                    metrics["count"],
                                )
                        else:  # "single"
                            _, images, labels, lr = item
                            self.state, metrics, grad_norms = self._train_step(
                                self.state, images, labels, lr
                            )
                            self._host_step += 1
                            steps_done += 1
                            if self.record_summaries:
                                pending_rows.append(
                                    self._pack_row(metrics, grad_norms)
                                )
                                if len(pending_rows) == chunk:
                                    row_chunks.append(jnp.stack(pending_rows))
                                    pending_rows = []
                                lrs.append(lr)
                            else:
                                self.train_metrics.update(
                                    metrics["loss"], metrics["correct"],
                                    metrics["count"],
                                )
                except BaseException:
                    # Dispatch loop died mid-epoch (checkpoint I/O error, user
                    # interrupt).  The producer may have run ahead — staged
                    # chunks in the queue plus the one being assembled hold
                    # already-consumed batches — and may even be stuck inside
                    # next(self._train_iter).  Recovery rule: the train iterator
                    # is REBUILT from the dataset, so (a) a zombie producer can
                    # never race a later train() call on the same iterator, and
                    # (b) the data position is well-defined (a fresh stream)
                    # rather than silently skewed by the drained look-ahead.
                    if self.train_dataset is not None:
                        self._train_iter = iter(self.train_dataset)
                    raise
                finally:
                    # Unblock and retire the producer whether the epoch finished
                    # or the dispatch loop raised: signal stop, drain any staged
                    # items it is blocked on, and wait for it to exit so a later
                    # train() never runs two producers over one iterator (a
                    # producer stuck in next() past the join timeout is covered
                    # by the iterator rebuild above — it holds the old stream).
                    stop_event.set()
                    try:
                        while True:
                            stage_q.get_nowait()
                    except queue.Empty:
                        pass
                    producer.join(timeout=10.0)

            if profiling:
                jax.profiler.stop_trace()
            if self.record_summaries and (row_chunks or pending_rows):
                if pending_rows:
                    row_chunks.append(jnp.stack(pending_rows))
                # One device->host fetch for the whole epoch's telemetry
                # (every additional fetch is a tunnel round trip).
                host_rows = np.asarray(jnp.concatenate(row_chunks, axis=0))
                losses, corrects, counts = (
                    host_rows[:, 0], host_rows[:, 1], host_rows[:, 2]
                )
                norms = host_rows[:, 3:]
                # Streaming metrics exactly as the reference logged them
                # mid-epoch: running mean of batch losses, running accuracy.
                mean_loss_run = np.cumsum(losses) / np.arange(1, len(losses) + 1)
                acc_run = np.cumsum(corrects) / np.maximum(np.cumsum(counts), 1.0)
                for i in range(len(host_rows)):
                    step = epoch_first_step + i
                    if step % summaries_frequency != 0:
                        continue
                    if self._train_csv is not None:
                        self._train_csv.log(
                            [step, mean_loss_run[i], acc_run[i]]
                            + [float(n) for n in norms[i]]
                        )
                    if self._summary_writer is not None:
                        self._summary_writer.scalar("learning_rate", lrs[i], step)
                        self._summary_writer.scalars(
                            {"mean_loss": mean_loss_run[i], "accuracy": acc_run[i]},
                            step,
                        )
                        if "mean_gradient_norms" in self.summaries:
                            for name, value in zip(self.gradient_names, norms[i]):
                                self._summary_writer.scalar(name, float(value), step)
                train_results = {
                    "mean_loss": float(mean_loss_run[-1]),
                    "accuracy": float(acc_run[-1]),
                }
            else:
                train_results = self.train_metrics.results()
            self.history["train"].append({"epoch": epoch, "step": self.global_step,
                                          **train_results})
            if verbose:
                dt = time.time() - epoch_start
                print(
                    f"Epoch {epoch}/{epochs}: loss={train_results['mean_loss']:.4f} "
                    f"acc={train_results['accuracy']:.4f} "
                    f"({steps_per_epoch / dt:.2f} steps/s)"
                )

            # -- periodic evaluation (reference :603-619) -------------------------
            eval_results = None
            if eval_frequency and epoch % eval_frequency == 0:
                eval_results = self._evaluate(
                    eval_dataset, eval_steps, scan_k=scan_k,
                    prefer_device=device_data,
                )
            if eval_results is not None:
                self.history["eval"].append(
                    {"epoch": epoch, "step": self.global_step, **eval_results}
                )
                if self._eval_csv is not None:
                    self._eval_csv.log(
                        [self.global_step, eval_results["mean_loss"],
                         eval_results["accuracy"]]
                    )
                if self._eval_summary_writer is not None:
                    self._eval_summary_writer.scalars(eval_results, self.global_step)
                if verbose:
                    print(
                        f"  eval: loss={eval_results['mean_loss']:.4f} "
                        f"acc={eval_results['accuracy']:.4f}"
                    )

            # -- best-metric bookkeeping + checkpointing (reference :625-668) ----
            monitored = eval_results if eval_results is not None else train_results
            improved = (
                monitored["mean_loss"] < self.best_metrics["loss"]
                if monitor == "loss"
                else monitored["accuracy"] > self.best_metrics["accuracy"]
            )
            self.best_metrics["loss"] = min(self.best_metrics["loss"],
                                            monitored["mean_loss"])
            self.best_metrics["accuracy"] = max(self.best_metrics["accuracy"],
                                                monitored["accuracy"])
            if (
                checkpointer is not None
                and epoch % save_frequency == 0
                and (improved or not save_best_only)
            ):
                checkpointer.save(
                    self.state,
                    self.global_step,
                    name=save_name,
                    tags=save_tags,
                    metrics={
                        "loss": monitored["mean_loss"],
                        "accuracy": monitored["accuracy"],
                    },
                )
        return self.history

    # -- evaluation ---------------------------------------------------------------

    def _eval_one(self, batch) -> None:
        images, labels = self._device_batch(batch)
        metrics = self._eval_step(
            self.state.params, self.state.model_state, images, labels
        )
        self.eval_metrics.update(
            metrics["loss"], metrics["correct"], metrics["count"]
        )

    def _run_eval(self, iterator, num_steps: int, scan_k: int = 0) -> dict:
        """Evaluate num_steps batches; with scan_k > 1, K batches per dispatch
        through `make_multi_eval_step` (ragged final batches fall back to the
        single-batch path)."""
        if num_steps < 1:
            # Evaluating zero batches would return fake 0.0 metrics (and
            # corrupt best-metric checkpoint gating downstream).
            raise ValueError(f"num_steps must be >= 1, got {num_steps}.")
        self.eval_metrics.reset()
        done = 0
        while done < num_steps:
            if scan_k > 1 and num_steps - done >= scan_k:
                batches = [next(iterator) for _ in range(scan_k)]
                if len({b[0].shape for b in batches}) == 1:
                    if scan_k not in self._multi_evals:
                        from differential_equations_resnet_tpu.train.train_step import (
                            make_multi_eval_step,
                        )

                        self._multi_evals[scan_k] = make_multi_eval_step(
                            self.model, mesh=self.mesh
                        )
                    images = np.stack([b[0] for b in batches])
                    labels = np.stack([b[1] for b in batches])
                    if self.mesh is not None:
                        from jax.sharding import NamedSharding, PartitionSpec as P

                        sh = NamedSharding(self.mesh, P(None, "data"))
                        images = jax.device_put(images, sh)
                        labels = jax.device_put(labels, sh)
                    metrics = self._multi_evals[scan_k](
                        self.state.params, self.state.model_state, images, labels
                    )
                    self.eval_metrics.update(
                        metrics["loss"], metrics["correct"], metrics["count"]
                    )
                else:  # ragged chunk (e.g. epoch-boundary partial batch)
                    for batch in batches:
                        self._eval_one(batch)
                done += scan_k
            else:
                self._eval_one(next(iterator))
                done += 1
        return self.eval_metrics.results()

    def _device_eval(self, source: str) -> dict:
        """Full-pass device-resident evaluation (one dispatch, one fetch —
        `make_device_eval`).  ``source`` is 'val' or 'train'; the arrays are
        uploaded once and cached."""
        arrays = self._val_arrays if source == "val" else self._train_arrays
        if source == "val":
            if self._device_val is None:
                self._device_val = (
                    self._put_replicated(arrays[0]),
                    self._put_replicated(np.asarray(arrays[1])),
                )
            device_arrays = self._device_val
        else:
            if self._device_train is None:
                self._device_train = (
                    self._put_replicated(arrays[0]),
                    self._put_replicated(np.asarray(arrays[1])),
                )
            device_arrays = self._device_train
        if source not in self._device_eval_fns:
            from differential_equations_resnet_tpu.train.train_step import (
                make_device_eval,
            )

            self._device_eval_fns[source] = make_device_eval(
                self.model, self.batch_size, mesh=self.mesh
            )
        metrics = self._device_eval_fns[source](
            self.state.params, self.state.model_state, *device_arrays
        )
        self.eval_metrics.reset()
        self.eval_metrics.update(
            metrics["loss"], metrics["correct"], metrics["count"]
        )
        return self.eval_metrics.results()

    def _evaluate(
        self, source: str, eval_steps: Optional[int], scan_k: int = 0,
        prefer_device: bool = False,
    ) -> Optional[dict]:
        """Mid-training evaluation on `source` ('val' or 'train' — the
        reference supports and even defaults to evaluating on the training
        set, training/training.py:477,605-612).

        `eval_steps=None` defaults to one full pass when the example count
        is known; with `prefer_device` (device-resident training) the full
        pass runs as ONE dispatch through `_device_eval`.  Returns None when
        the requested dataset isn't available (eval is skipped, matching the
        previous no-val-data behavior)."""
        arrays = self._val_arrays if source == "val" else self._train_arrays
        if source == "val":
            stream = self.val_dataset
            n = self._num_val_examples
            full_pass = None if n is None else -(-n // self.batch_size)
        else:
            stream = self.train_dataset
            n = self._num_train_examples
            # The training pipeline drops the remainder batch.
            full_pass = None if n is None else max(1, n // self.batch_size)
        if stream is None and arrays is None:
            return None
        if eval_steps is not None and eval_steps < 1:
            raise ValueError(f"eval_steps must be >= 1, got {eval_steps}.")
        if prefer_device and arrays is not None:
            # The device pass covers ALL examples (ragged tail masked), so it
            # serves both an explicit ceil(N/batch) request and the default
            # eval_steps=None — checked BEFORE the streaming-path default
            # below, which floors for the remainder-dropping train stream.
            device_full = -(-len(arrays[0]) // self.batch_size)
            if eval_steps is None or eval_steps == device_full:
                return self._device_eval(source)
        if eval_steps is None:
            eval_steps = full_pass  # still None when the count is unknown
        if eval_steps is None:
            raise ValueError(
                "eval_steps is required when the dataset was passed as a "
                "pipeline object (example count unknown)."
            )
        # 'val' reuses the persistent repeating val iterator; 'train' gets a
        # FRESH stream so evaluation never consumes (skips) training batches
        # from the live iterator — the wart the reference's shared feedable
        # handle had (see `evaluate` docstring).
        iterator = self._val_iter if source == "val" else iter(stream)
        return self._run_eval(iterator, eval_steps, scan_k)

    def evaluate(
        self,
        dataset: str = "val",
        num_steps: Optional[int] = None,
        scan_steps: int = 0,
        device_data: bool = False,
    ) -> dict:
        """Standalone evaluation (reference `evaluate`,
        training/training.py:708-750).  `scan_steps=K > 1` evaluates K
        batches per dispatch.  `device_data=True` runs a FULL pass over the
        device-resident arrays in one dispatch (requires array-backed data
        and num_steps=None or the full-pass count).

        Always evaluates over a FRESH pass of the requested dataset, never
        the live training/validation iterators — evaluating mid-training must
        not silently consume (skip) training batches.  (The reference shares
        that wart via its feedable string handle; fixed here.)"""
        if dataset == "train":
            source = self.train_dataset
            n = self._num_train_examples
            # The training pipeline drops the remainder batch.
            full_pass = None if n is None else max(1, n // self.batch_size)
        elif dataset == "val":
            source = self.val_dataset
            n = self._num_val_examples
            full_pass = None if n is None else -(-n // self.batch_size)
        else:
            raise ValueError("dataset must be 'train' or 'val'.")
        if device_data:
            arrays = self._train_arrays if dataset == "train" else self._val_arrays
            if arrays is None:
                raise ValueError(
                    "evaluate(device_data=True) requires array-backed data "
                    f"for {dataset!r}."
                )
            device_full = -(-len(arrays[0]) // self.batch_size)
            if num_steps not in (None, device_full):
                raise ValueError(
                    "evaluate(device_data=True) always runs one full pass "
                    f"({device_full} batches); num_steps={num_steps} is not "
                    "supported."
                )
            return self._device_eval(dataset)
        if source is None:
            raise ValueError(f"No {dataset} dataset available.")
        if num_steps is None:
            if full_pass is None:
                raise ValueError(
                    "num_steps is required when the dataset was passed as a "
                    "pipeline object (example count unknown)."
                )
            num_steps = full_pass
        return self._run_eval(iter(source), num_steps, scan_steps)

    # -- inference -----------------------------------------------------------------

    def predict(self, images: np.ndarray, batch_size: Optional[int] = None) -> np.ndarray:
        """Model outputs for a batch of images (fixes the reference's broken
        `predict`, training/training.py:752-779).  Pads the final partial
        batch so the jitted step sees one static shape."""
        batch_size = batch_size or self.batch_size
        outputs = []
        for start in range(0, len(images), batch_size):
            chunk = images[start : start + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            out = self._predict_step(
                self.state.params, self.state.model_state, jnp.asarray(chunk)
            )
            out = np.asarray(out)
            outputs.append(out[: len(out) - pad] if pad else out)
        return np.concatenate(outputs, axis=0)

    # -- persistence ------------------------------------------------------------------

    def save(
        self,
        save_dir: str,
        tags: Sequence[str] = ("default",),
        name: str = "",
        saver: str = "orbax",
    ) -> str:
        """Checkpoint the full TrainState (reference `save`,
        training/training.py:781-858)."""
        checkpointer = Checkpointer(save_dir, backend=saver)
        return checkpointer.save(
            self.state, self.global_step, name=name, tags=tags,
            metrics={"loss": self.best_metrics["loss"],
                     "accuracy": self.best_metrics["accuracy"]},
        )

    def load_variables(self, path: str) -> None:
        """Restore a checkpoint into this trainer (reference `load_variables`,
        training/training.py:860-865)."""
        import os

        base = os.path.dirname(os.path.abspath(path.rstrip("/")))
        checkpointer = Checkpointer(base)
        self.state = checkpointer.restore(self.state, os.path.abspath(path.rstrip("/")))
        self._host_step = int(self.state.step)

    def close(self) -> None:
        """Release logger resources (reference `close`,
        training/training.py:867-876)."""
        for writer in (self._summary_writer, self._eval_summary_writer):
            if writer is not None:
                writer.close()
        for logger in (self._train_csv, self._eval_csv):
            if logger is not None:
                logger.close()
