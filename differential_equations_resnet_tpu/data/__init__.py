"""Host-side data pipeline: tf.data-free NumPy datasets, CIFAR-10 loading,
composable preprocessors, and sharded binary record IO
(rebuild of the reference's dataset_utils/ package)."""

from differential_equations_resnet_tpu.data.pipeline import (  # noqa: F401
    NumpyDataset,
    create_dataset_from_arrays,
)
from differential_equations_resnet_tpu.data.cifar10 import (  # noqa: F401
    build_cifar10_dataset,
    synthetic_cifar10,
    unpickle,
)
from differential_equations_resnet_tpu.data.mnist import (  # noqa: F401
    build_mnist_dataset,
    find_mnist_directory,
    mnist_single_block_config,
    synthetic_mnist,
)
from differential_equations_resnet_tpu.data.preprocessors import (  # noqa: F401
    ConvertLabelsToOneHot,
    DecodeImages,
    DecodeJPEGImages,
    RandomBrightness,
    RandomCrop,
    RandomFlipLeftRight,
    RandomSaturation,
    Resize,
    ResizeWithPad,
    UnpackImagesLabels,
)
from differential_equations_resnet_tpu.data.records import (  # noqa: F401
    RecordDatasetCreator,
    RecordGenerator,
    get_record_paths,
)
from differential_equations_resnet_tpu.data import jit_augment  # noqa: F401
