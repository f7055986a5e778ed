"""Utilities: weight surgery (pickling, depth-doubling continuation)."""

from differential_equations_resnet_tpu.utils.weight_utils import (  # noqa: F401
    double_load_weights,
    double_model_depth,
    export_reference_weights,
    import_reference_weights,
    load_pickled_weights,
    pickle_model_weights,
)
