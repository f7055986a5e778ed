"""Large-batch device-resident training A/B (VERDICT r2 task 1).

The round-2 batch table (docs/RESULTS.md section 2b) showed a 2.4x img/s
frontier at b=128 (direct layout) over the b=32 headline; this example
productizes it: train the headline 64Lx16F antisymmetric model at several
batch sizes for EQUAL EPOCHS on the SAME data with linearly scaled learning
rates (Goyal et al.'s lr ~ batch rule), entirely device-resident (uint8
dataset in HBM, one XLA dispatch per epoch), and report convergence parity
(final train loss + full-pass eval) alongside throughput (steps/s, img/s).

The mesh-aware s2d row gate picks the winning layout per batch size
automatically (packed at b=32, direct at b>=64) — no knobs.

Run (TPU): python examples/large_batch_training.py --epochs 3
"""

import _bootstrap  # noqa: F401  (repo-root import shim for source checkouts)
import argparse
import json
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--train-size", type=int, default=20000)
    parser.add_argument("--val-size", type=int, default=2000)
    parser.add_argument("--batches", default="32,128",
                        help="comma-separated batch sizes to A/B")
    parser.add_argument("--base-lr", type=float, default=1e-3,
                        help="learning rate at batch 32 (scaled linearly)")
    parser.add_argument("--warmup-steps", type=int, default=0,
                        help="linear lr warmup steps (0 = off): the measured "
                             "remedy for Goyal-scaled lrs near the deep "
                             "antisymmetric stack's stability boundary, "
                             "which int8-forward tightens (RESULTS 6f)")
    parser.add_argument("--num-layers", type=int, default=64)
    parser.add_argument("--num-filters", type=int, default=16)
    parser.add_argument("--cifar10-dir", default=None)
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: microbatch each "
                             "effective batch into this many sequential "
                             "passes (identical numerics, 1/k activation "
                             "memory — effective batches beyond HBM)")
    parser.add_argument("--compare-bf16", action="store_true",
                        help="run each batch size in fp32 AND bfloat16 "
                             "compute (same lr), reporting convergence "
                             "deltas across dtypes too")
    parser.add_argument("--dtypes", default=None,
                        help="comma-separated compute dtypes for the arms "
                             "(e.g. 'bfloat16'); overrides --compare-bf16's "
                             "fp32+bf16 pairing — used by the RESULTS 6g "
                             "convergence A/B to run bf16-only arms")
    parser.add_argument("--compare-int8", action="store_true",
                        help="additionally run each arm with int8-forward "
                             "training (dynamic-w8a8 forward convs, "
                             "straight-through-estimator backward) — the "
                             "convergence A/B for docs/RESULTS.md 6f; pair "
                             "with --num-filters 128 where the speedup "
                             "exists")
    parser.add_argument("--int8-backward", default="ste",
                        help="backward mode(s) for the --compare-int8 arms, "
                             "comma-separated from {ste,dgrad,wgrad,full}: "
                             "'wgrad' is the convergent production mode "
                             "(int8 wgrad conv + int8 saved residuals); "
                             "'dgrad'/'full' quantize the residual-stream "
                             "cotangent and measurably diverge at "
                             "lane-filling widths — docs/RESULTS.md 6g.  A "
                             "list adds one int8 arm per mode (the 6g "
                             "three-arm A/B: --int8-backward dgrad,full)")
    args = parser.parse_args()

    from differential_equations_resnet_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

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
    from differential_equations_resnet_tpu.utils.flops import (
        mfu,
        single_block_train_flops,
    )

    cifar_dir = args.cifar10_dir or find_cifar10_directory()
    if cifar_dir:
        print(f"# loading CIFAR-10 from {cifar_dir}", file=sys.stderr)
        train_x, train_y, test_x, test_y, _ = build_cifar10_dataset(cifar_dir)
        train_x, train_y = train_x[: args.train_size], train_y[: args.train_size]
        test_x, test_y = test_x[: args.val_size], test_y[: args.val_size]
    else:
        print("# synthetic data (CIFAR-10 not on disk)", file=sys.stderr)
        train_x, train_y, test_x, test_y, _ = synthetic_cifar10(
            args.train_size, args.val_size, seed=0
        )

    import jax.numpy as jnp

    if args.dtypes:
        dtypes = tuple(jnp.dtype(d).type for d in args.dtypes.split(","))
    elif args.compare_bf16:
        dtypes = (jnp.float32, jnp.bfloat16)
    else:
        dtypes = (jnp.float32,)
    int8_modes = args.int8_backward.split(",")
    for m in int8_modes:
        if m not in ("ste", "dgrad", "wgrad", "full"):
            parser.error(f"--int8-backward: unknown mode {m!r}")
    arms = [
        (int(b), dtype, int8)
        for b in args.batches.split(",")
        for dtype in dtypes
        for int8 in ((None, *int8_modes) if args.compare_int8 else (None,))
    ]
    runs = []
    for batch, compute_dtype, int8_mode in arms:
        int8_forward = int8_mode is not None
        lr = args.base_lr * batch / 32.0
        config = cifar10_single_block_config(
            num_layers=args.num_layers, num_filters=args.num_filters,
            compute_dtype=compute_dtype,
            int8_forward=int8_forward,
            int8_backward=int8_mode if int8_forward else "ste",
        )
        model = build_single_block_resnet(config)
        trainer = Training(
            model,
            train_features=train_x, train_labels=train_y,
            val_features=test_x, val_labels=test_y,
            batch_size=batch,
            record_summaries=False,
            seed=0, data_seed=0,
            accum_steps=args.accum_steps,
        )
        from differential_equations_resnet_tpu.train import (
            linear_warmup_schedule,
        )

        lr_schedule = linear_warmup_schedule(lr, args.warmup_steps)
        steps_per_epoch = len(train_x) // batch
        t0 = time.time()
        history = trainer.train(
            epochs=args.epochs,
            steps_per_epoch=steps_per_epoch,
            learning_rate_schedule=lr_schedule,
            eval_frequency=args.epochs,  # one eval, at the end
            device_data=True,
            verbose=True,
        )
        wall = time.time() - t0
        steps = args.epochs * steps_per_epoch
        flops = single_block_train_flops(config, batch)
        runs.append({
            "batch": batch,
            "accum_steps": args.accum_steps,
            "dtype": jnp.dtype(compute_dtype).name,
            "int8_forward": int8_forward,
            "int8_backward": int8_mode,
            "lr": lr,
            "steps": steps,
            "final_train_loss": history["train"][-1]["mean_loss"],
            "final_train_acc": history["train"][-1]["accuracy"],
            "eval_loss": history["eval"][-1]["mean_loss"],
            "eval_acc": history["eval"][-1]["accuracy"],
            # Wall time includes the one-time compiles; sustained throughput
            # is the per-epoch print above and bench.py's timed dispatches.
            "wall_s": round(wall, 1),
            "img_per_sec_incl_compile": round(steps * batch / wall, 1),
            "mfu_vs_bf16_peak_incl_compile": round(
                mfu(flops, steps / wall), 4
            ),
        })
        trainer.close()

    base = runs[0]
    out = {"runs": runs}
    if len(runs) > 1:
        out["convergence_delta_vs_base"] = [
            {
                "batch": r["batch"],
                "dtype": r["dtype"],
                "int8_forward": r["int8_forward"],
                "int8_backward": r["int8_backward"],
                "train_loss_delta": round(
                    r["final_train_loss"] - base["final_train_loss"], 4
                ),
                "eval_loss_delta": round(
                    r["eval_loss"] - base["eval_loss"], 4
                ),
                "eval_acc_delta": round(r["eval_acc"] - base["eval_acc"], 4),
            }
            for r in runs[1:]
        ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
