"""Experiment drivers: library equivalents of the reference's notebook
workflows (stability analysis, gamma sweeps, depth scaling)."""

from differential_equations_resnet_tpu.experiments.deep_stability import (  # noqa: F401
    conv_matrix_spectrum,
    forward_stability_report,
    gamma_sweep,
)
from differential_equations_resnet_tpu.experiments.sweeps import (  # noqa: F401
    imagenet32_config,
    measure_train_throughput,
    width_depth_sweep,
)
