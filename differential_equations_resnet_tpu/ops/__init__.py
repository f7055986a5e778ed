"""Core compute ops: packed antisymmetric kernels, convs, ODE integrators."""

from differential_equations_resnet_tpu.ops.antisymmetric import (  # noqa: F401
    Antisym3x3DenseParams,
    Antisym3x3Params,
    AntisymKxKParams,
    cross_pair_indices,
    dense_from_packed,
    he_truncated_normal,
    init_antisym_3x3,
    init_antisym_3x3_dense,
    init_antisym_kxk,
    materialize_3x3,
    materialize_3x3_from_dense,
    materialize_3x3_stacked,
    materialize_kxk,
    num_cross_pairs,
    num_diag_free,
    pack_3x3,
    packed_from_dense,
)
from differential_equations_resnet_tpu.ops.conv import (  # noqa: F401
    antisym_conv2d_3x3,
    conv2d_same,
)
from differential_equations_resnet_tpu.ops.integrators import (  # noqa: F401
    INTEGRATOR_STAGES,
    euler_step,
    get_integrator,
    integrate,
    midpoint_step,
    rk4_step,
)
from differential_equations_resnet_tpu.ops.quantize import (  # noqa: F401
    QuantizedConvParams,
    dynamic_int8_conv_same,
    quantize_activations_per_tensor,
    quantize_kernel_per_cout,
)
