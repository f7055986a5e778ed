"""Depth-doubling continuation: train a coarse L-step model, double to 2L
steps with halved h (warm start), continue training — the ODE-refinement
workflow of the reference's `double_load_weights`
(model_utils/weight_utils.py:41-79) driven from its v6/v7 notebooks.

    python examples/depth_doubling_continuation.py [--start-layers 8]
"""

import _bootstrap  # noqa: F401  (repo-root import shim for source checkouts)
import argparse
import json

from differential_equations_resnet_tpu.data.cifar10 import (
    build_cifar10_dataset,
    find_cifar10_directory,
    synthetic_cifar10,
)
from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.train import Training
from differential_equations_resnet_tpu.utils import double_model_depth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--start-layers", type=int, default=8)
    parser.add_argument("--doublings", type=int, default=2)
    parser.add_argument("--epochs-per-stage", type=int, default=1)
    parser.add_argument("--num-filters", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--cifar10-dir", default=None)
    args = parser.parse_args()

    cifar_dir = args.cifar10_dir or find_cifar10_directory()
    if cifar_dir:
        train_x, train_y, test_x, test_y, _ = build_cifar10_dataset(cifar_dir)
    else:
        print("# CIFAR-10 not found; running on synthetic data")
        train_x, train_y, test_x, test_y, _ = synthetic_cifar10(8192, 2048)

    config = cifar10_single_block_config(
        num_layers=args.start_layers, num_filters=args.num_filters
    )
    params = None
    report = []
    for stage in range(args.doublings + 1):
        model = build_single_block_resnet(config)
        trainer = Training(
            model,
            train_features=train_x,
            train_labels=train_y,
            val_features=test_x,
            val_labels=test_y,
            batch_size=args.batch_size,
            record_summaries=False,
        )
        if params is not None:  # warm start from the doubled coarse solution
            trainer.state = trainer.state._replace(params=params)
        steps = (len(train_x) + args.batch_size - 1) // args.batch_size
        eval_steps = (len(test_x) + args.batch_size - 1) // args.batch_size
        history = trainer.train(
            epochs=args.epochs_per_stage,
            steps_per_epoch=steps,
            learning_rate_schedule=lambda s: 1e-3,
            eval_steps=eval_steps,
        )
        layers = config.blocks_per_stage[0]
        report.append(
            {"layers": layers, "h": config.h, **history["eval"][-1]}
        )
        if stage < args.doublings:
            params, config = double_model_depth(trainer.state.params, config)
        trainer.close()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
