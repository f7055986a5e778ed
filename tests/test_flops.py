"""Analytic FLOP accounting (utils/flops.py) sanity checks."""

import numpy as np

from differential_equations_resnet_tpu.models import (
    SingleBlockResNetConfig,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.utils.flops import (
    mfu,
    single_block_forward_flops,
    single_block_train_flops,
)


def test_headline_config_flops_hand_count():
    """64L x 16F CIFAR config at b=32: stem + 64 identity convs + head,
    hand-counted."""
    cfg = cifar10_single_block_config()
    expected = (
        2 * 32 * 32 * 32 * 9 * 3 * 16          # stem 3->16
        + 64 * 2 * 32 * 32 * 32 * 9 * 16 * 16  # 64 identity layers
        + 2 * 32 * 16 * 10                     # head
    )
    assert single_block_forward_flops(cfg, 32) == expected
    assert single_block_train_flops(cfg, 32) == 3 * expected


def test_flops_scale_linearly_with_batch_and_integrator():
    cfg = cifar10_single_block_config(num_layers=8)
    f32 = single_block_forward_flops(cfg, 32)
    f128 = single_block_forward_flops(cfg, 128)
    assert f128 == 4 * f32
    rk4 = cifar10_single_block_config(num_layers=8, integrator="rk4")
    f_rk4 = single_block_forward_flops(rk4, 32)
    # Only the identity layers multiply by field evals; stem/head do not.
    stem_head = 2 * 32 * 32 * 32 * 9 * 3 * 16 + 2 * 32 * 16 * 10
    assert f_rk4 == stem_head + 4 * (f32 - stem_head)


def test_flops_with_conv_block_and_pooling():
    """Multi-stage config: pooling halves spatial dims, the conv block adds
    kxk main + 1x1 shortcut at the strided resolution."""
    cfg = SingleBlockResNetConfig(
        image_shape=(16, 16, 3),
        kernel_type="regular",
        h=0.5,
        num_stages=3,
        blocks_per_stage=(2, 2),
        filters_per_block=(8, 16),
        strides=((1, 1), (2, 2)),
        num_classes=5,
        use_max_pooling=(False, False, False, False),
    )
    # stem: 16x16, 3->8; stage1: 2 identity at 16x16 C=8;
    # stage2: conv block to 8x8 C=16 (9x + 1x1) + 1 identity at 8x8 C=16.
    rows16 = 16 * 16
    rows8 = 8 * 8
    expected = (
        2 * rows16 * 9 * 3 * 8
        + 2 * (2 * rows16 * 9 * 8 * 8)
        + 2 * rows8 * (9 + 1) * 8 * 16
        + 1 * (2 * rows8 * 9 * 16 * 16)
        + 2 * 16 * 5
    )
    assert single_block_forward_flops(cfg, 1) == expected


def test_mfu_definition():
    np.testing.assert_allclose(mfu(1e9, 197.0, peak=197e12), 1e-3)
