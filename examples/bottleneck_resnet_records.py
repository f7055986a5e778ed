"""Bottleneck ResNet-50 trained from sharded binary records — the v6
notebook's Caltech-256 workflow (image directory tree -> TFRecords ->
ResNet-50 with antisymmetric 3x3 mid-convs; reference
`dataset_utils/tfrecord_generator.py` + `models/tfkeras_resnets.py:698-818`),
rebuilt on the DERT record format and the functional bottleneck models.

With no image directory supplied, a tiny synthetic `<label>_<n>.png`-style
tree is written first so the example is self-contained.

    python examples/bottleneck_resnet_records.py [--images DIR] [--image-size 64]
"""

import _bootstrap  # noqa: F401  (repo-root import shim for source checkouts)
import argparse
import os
import tempfile

import numpy as np

from differential_equations_resnet_tpu.data import (
    ConvertLabelsToOneHot,
    DecodeImages,
    RecordDatasetCreator,
    RecordGenerator,
    Resize,
    UnpackImagesLabels,
    get_record_paths,
)
from differential_equations_resnet_tpu.models import build_resnet, resnet_preset
from differential_equations_resnet_tpu.train import Training


def write_synthetic_image_tree(root: str, num_classes: int, per_class: int) -> None:
    """Class-colored noise images named `<label>_<n>.png` (the reference's
    filename-derived-label convention, tfrecord_generator.py:211-217)."""
    try:
        from PIL import Image
    except ImportError:  # store raw arrays instead
        Image = None
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for label in range(num_classes):
        for n in range(per_class):
            arr = rng.integers(0, 80, (48, 48, 3), dtype=np.uint8)
            arr[..., label % 3] += np.uint8(120)
            path = os.path.join(root, f"{label}_{n}.png")
            if Image is not None:
                Image.fromarray(arr).save(path)
            else:
                np.save(path + ".npy", arr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None, help="image directory tree")
    parser.add_argument("--records", default=None, help="records output dir")
    parser.add_argument("--num-classes", type=int, default=4)
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--preset", default="resnet50",
                        choices=["resnet50", "resnet101", "resnet152"])
    args = parser.parse_args()

    workdir = tempfile.mkdtemp(prefix="dert_example_")
    images = args.images or os.path.join(workdir, "images")
    records = args.records or os.path.join(workdir, "records")
    if args.images is None:
        print(f"# writing synthetic image tree -> {images}")
        write_synthetic_image_tree(images, args.num_classes, per_class=24)

    # 1. Directory tree -> sharded records with a train/val split
    #    (reference TFRecordGenerator.convert, tfrecord_generator.py:35-99).
    RecordGenerator().convert(
        input_directory=images,
        output_directory=records,
        prefix="caltech_like",
        num_files_per_record=32,
        train_val_split=0.25,
    )

    # 2. Records -> batched dataset with the preprocessor chain
    #    (reference TFRecordDatasetCreator, tfrecord_dataset_creator.py:24-122).
    size = (args.image_size, args.image_size)
    def creator(split, train):
        return RecordDatasetCreator(
            record_paths=get_record_paths(os.path.join(records, split)),
            batch_size=args.batch_size,
            preprocessors=[
                UnpackImagesLabels(),
                DecodeImages(channels=3),
                Resize(target_size=size),
                ConvertLabelsToOneHot(num_classes=args.num_classes),
            ],
            shuffle=train,
            repeat=True,
            shuffle_buffer_size=256,
        ).create_dataset()

    train_ds = creator("train", True)
    val_ds = creator("val", False)

    # 3. Bottleneck ResNet with antisymmetric 3x3 mid-convs
    #    (reference get_resnet_build_function presets, tfkeras_resnets.py:719-745).
    model = build_resnet(
        resnet_preset(
            args.preset,
            num_classes=args.num_classes,
            antisymmetric_mid=True,
            image_shape=(args.image_size, args.image_size, 3),
        )
    )

    trainer = Training(
        model,
        train_dataset=train_ds,
        val_dataset=val_ds,
        batch_size=args.batch_size,
        record_summaries=False,
    )
    history = trainer.train(
        epochs=1,
        steps_per_epoch=args.steps,
        learning_rate_schedule=lambda step: 1e-3,
        eval_steps=2,
    )
    print("history:", history["train"][-1], history["eval"][-1])


if __name__ == "__main__":
    main()
