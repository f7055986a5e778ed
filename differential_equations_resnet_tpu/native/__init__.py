"""Native (C++) components: the DERT record codec."""

from differential_equations_resnet_tpu.native.codec import (  # noqa: F401
    native_codec_available,
    read_raw_shard,
    write_raw_shard,
)
