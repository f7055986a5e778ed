"""Native (C++) components: the DERT record codec and the threaded
prefetching batch loader."""

from differential_equations_resnet_tpu.native.codec import (  # noqa: F401
    native_codec_available,
    read_raw_shard,
    write_raw_shard,
)
from differential_equations_resnet_tpu.native.loader import (  # noqa: F401
    NativeRecordLoader,
    native_loader_available,
)
