"""Training harness: functional jit/pjit train step, streaming metrics,
per-layer gradient-norm telemetry, logging, checkpointing, LR schedules, and
the offline TrainingHistory analysis (rebuild of the reference's training/
package plus the v7-notebook analysis class)."""

from differential_equations_resnet_tpu.train.metrics import StreamingMetrics  # noqa: F401
from differential_equations_resnet_tpu.train.schedules import (  # noqa: F401
    constant_schedule,
    exponential_decay_schedule,
    linear_warmup_schedule,
    piecewise_constant_schedule,
)
from differential_equations_resnet_tpu.train.telemetry import (  # noqa: F401
    CsvLogger,
    SummaryWriter,
    gradient_metric_names,
    gradient_mean_norms,
)
from differential_equations_resnet_tpu.train.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_adam,
    make_eval_step,
    make_device_epoch,
    make_device_eval,
    make_multi_eval_step,
    make_multi_step,
    make_predict_step,
    make_train_step,
)
from differential_equations_resnet_tpu.train.training import Training  # noqa: F401
from differential_equations_resnet_tpu.train.history import TrainingHistory  # noqa: F401
from differential_equations_resnet_tpu.train.checkpoint import (  # noqa: F401
    Checkpointer,
)
