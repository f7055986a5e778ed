"""Model assembly: pure init/apply builders for the reference's two model
families (models/tfkeras_resnets.py): single-block ODE-ResNets and bottleneck
ResNet-50/101/152."""

from differential_equations_resnet_tpu.models.blocks import (  # noqa: F401
    BatchNormParams,
    BatchNormState,
    ConvParams,
    DenseParams,
    batch_norm,
    init_batch_norm,
    init_conv,
    init_dense,
)
from differential_equations_resnet_tpu.models.single_block_resnet import (  # noqa: F401
    SingleBlockResNetConfig,
    build_single_block_resnet,
    cifar10_single_block_config,
    get_single_block_resnet_build_function,
)
from differential_equations_resnet_tpu.models.quantized import (  # noqa: F401
    apply_quantized,
    apply_resnet_quantized,
    apply_single_block_resnet_quantized,
    make_quantized_forward,
)
from differential_equations_resnet_tpu.models.bottleneck_resnet import (  # noqa: F401
    BottleneckResNetConfig,
    build_resnet,
    get_resnet_build_function,
    resnet_preset,
)
