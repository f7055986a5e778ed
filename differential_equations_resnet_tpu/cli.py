"""Command-line interface.

The reference has no config/flag system — everything lives in notebook cells
(SURVEY.md section 5.6).  This CLI exposes the notebook workflows as
subcommands over the typed dataclass configs:

    train            headline CIFAR-10 single-block runs (v7 notebook cells 1-8)
    evaluate         restore a checkpoint and evaluate
    predict          batch inference from .npy arrays or image directories
    benchmark        steps/sec + batch-1 inference latency (v7 cells 19-25)
    analyze          TrainingHistory gradient-flow diagnostics (v7 cell 27)
    deep-stability   100-step gamma sweep + conv-matrix eigenvalue check
    sweep            width x depth train-throughput grid
    convert-records  image directory tree -> sharded binary records
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--model",
        choices=["single_block", "resnet50", "resnet101", "resnet152"],
        default="single_block",
        help="single-block ODE-ResNet (v7 notebook) or a bottleneck preset "
        "(v6 notebook's Caltech-256 ResNet-50 workflow)",
    )
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--resnet-version", type=float, default=1,
                   choices=[1, 1.5], help="bottleneck striding variant")
    p.add_argument("--num-layers", type=int, default=64)
    p.add_argument("--num-filters", type=int, default=16)
    p.add_argument("--final-time", type=float, default=8.0)
    p.add_argument("--gamma", type=float, default=0.0)
    p.add_argument(
        "--kernel-type",
        choices=["antisymmetric", "regular", "centrosymmetric"],
        default="antisymmetric",
        help="centrosymmetric = the reference general layer's "
             "antisymmetric=False mode (trainable center, any odd "
             "--kernel-size)",
    )
    p.add_argument("--kernel-size", type=int, default=3,
                   help="spatial kernel size (centrosymmetric/regular only; "
                        "the antisymmetric path is 3x3-specialized)")
    p.add_argument(
        "--integrator", choices=["euler", "midpoint", "rk4"], default="euler"
    )
    p.add_argument("--remat", action="store_true")
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--s2d-block", type=int, default=2,
                   help="b>1: space-to-depth packed integrator (exact; 0=off)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params/optimizer stay fp32). "
                        "Worth up to 1.55x at lane-filling trunk widths "
                        "(C>=64); ~2%% at the 16-filter reference configs "
                        "(docs/RESULTS.md 6c)")
    p.add_argument("--int8-forward", action="store_true",
                   help="dynamic-w8a8 int8 FORWARD convs in the trunk, "
                        "straight-through-estimator backward (both "
                        "families; single-block wins at C>=128, bottleneck "
                        "gates on mid width >= 256 — docs/RESULTS.md 6f)")
    p.add_argument("--int8-backward",
                   choices=["ste", "dgrad", "wgrad", "full"],
                   default="ste",
                   help="with --int8-forward: 'wgrad' runs the weight-"
                        "gradient conv in w8a8 with int8 saved activations "
                        "(~1.5x deeper no-remat capacity; the CONVERGENT "
                        "int8-backward mode); 'ste' = fp backward; 'dgrad'/"
                        "'full' also quantize the residual-stream cotangent "
                        "— measured divergent at depth, experimental/"
                        "throughput-only (docs/RESULTS.md 6g)")


def _build_model(args):
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    if getattr(args, "model", "single_block") != "single_block":
        from differential_equations_resnet_tpu.models import (
            build_resnet,
            resnet_preset,
        )

        size = args.image_size
        config = resnet_preset(
            args.model,
            num_classes=args.num_classes,
            antisymmetric_mid=(args.kernel_type == "antisymmetric"),
            image_shape=(size, size, 3),
            version=args.resnet_version,
            gamma=args.gamma,
            compute_dtype=compute_dtype,
            int8_forward=getattr(args, "int8_forward", False),
            int8_backward=getattr(args, "int8_backward", "ste"),
        )
        return build_resnet(config)

    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )

    config = cifar10_single_block_config(
        num_layers=args.num_layers,
        final_time=args.final_time,
        num_filters=args.num_filters,
        kernel_type=args.kernel_type,
        kernel_size=getattr(args, "kernel_size", 3),
        gamma=args.gamma,
        integrator=args.integrator,
        remat=args.remat,
        use_pallas=args.use_pallas,
        s2d_block=getattr(args, "s2d_block", 2),
        compute_dtype=compute_dtype,
        int8_forward=getattr(args, "int8_forward", False),
        int8_backward=getattr(args, "int8_backward", "ste"),
    )
    return build_single_block_resnet(config)


def _load_data(args):
    from differential_equations_resnet_tpu.data.cifar10 import (
        build_cifar10_dataset,
        find_cifar10_directory,
        synthetic_cifar10,
    )

    cifar_dir = getattr(args, "cifar10_dir", None) or find_cifar10_directory()
    if cifar_dir:
        print(f"# loading CIFAR-10 from {cifar_dir}", file=sys.stderr)
        return build_cifar10_dataset(cifar_dir)
    print("# CIFAR-10 not found on disk; using synthetic data", file=sys.stderr)
    return synthetic_cifar10(
        num_train=getattr(args, "synthetic_train_size", None) or 50000,
        num_test=getattr(args, "synthetic_val_size", None) or 10000,
    )


def cmd_train(args) -> int:
    from differential_equations_resnet_tpu.train import Training

    model = _build_model(args)
    train_x, train_y, test_x, test_y, _ = _load_data(args)
    trainer = Training(
        model,
        train_features=train_x,
        train_labels=train_y,
        val_features=test_x,
        val_labels=test_y,
        batch_size=args.batch_size,
        csv_logger_dir=args.csv_dir,
        csv_logger_name=f"single_block_{args.kernel_type}_{args.num_layers}-layers_{args.num_filters}-filters",
        summaries_dir=args.summaries_dir,
        accum_steps=args.accum_steps,
    )
    if args.resume:
        from differential_equations_resnet_tpu.train import Checkpointer

        if not args.save_dir:
            raise SystemExit("--resume requires --save-dir")
        checkpointer = Checkpointer(args.save_dir)
        latest = checkpointer.latest()
        if latest is not None:
            import os
            import re

            ckpt_path = os.path.join(args.save_dir, latest)
            trainer.load_variables(ckpt_path)
            # Restore the best-metric watermark so post-resume gating doesn't
            # restart at loss=inf and evict genuinely better checkpoints.
            # Primary source: the sidecar metadata payload; fall back to the
            # metric-encoded directory name for legacy checkpoints.
            meta = checkpointer.read_meta(ckpt_path)
            if meta and meta.get("metrics"):
                metrics = meta["metrics"]
                if "loss" in metrics:
                    trainer.best_metrics["loss"] = float(metrics["loss"])
                if "accuracy" in metrics:
                    trainer.best_metrics["accuracy"] = float(metrics["accuracy"])
            else:
                m = re.search(r"loss-([0-9.eE+-]+)_accuracy-([0-9.eE+-]+)", latest)
                if m:
                    trainer.best_metrics["loss"] = float(m.group(1))
                    trainer.best_metrics["accuracy"] = float(m.group(2))
            print(f"# resumed from {latest} at step {trainer.global_step}",
                  file=sys.stderr)
        else:
            print("# --resume: no checkpoint found, starting fresh",
                  file=sys.stderr)
    steps_per_epoch = args.steps_per_epoch or (
        (len(train_x) + args.batch_size - 1) // args.batch_size
    )
    if args.device_data:
        # Whole-epoch device residency draws batches without replacement;
        # clamp the epoch to the dataset size.
        steps_per_epoch = min(steps_per_epoch, len(train_x) // args.batch_size)
    from differential_equations_resnet_tpu.train import linear_warmup_schedule

    lr_schedule = linear_warmup_schedule(args.learning_rate, args.warmup_steps)
    trainer.train(
        epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        learning_rate_schedule=lr_schedule,
        eval_dataset=args.eval_dataset,
        eval_steps=args.eval_steps,  # None = one full pass (Training default)
        save_during_training=args.save_dir is not None,
        save_dir=args.save_dir,
        monitor=args.monitor,
        summaries_frequency=args.summaries_frequency,
        scan_steps=args.scan_steps,
        device_data=args.device_data,
        save_frequency=args.save_frequency,
    )
    print(json.dumps({"best": trainer.best_metrics}))
    trainer.close()
    return 0


def cmd_evaluate(args) -> int:
    from differential_equations_resnet_tpu.train import Training

    model = _build_model(args)
    _, _, test_x, test_y, _ = _load_data(args)
    trainer = Training(
        model,
        val_features=test_x,
        val_labels=test_y,
        batch_size=args.batch_size,
        record_summaries=False,
    )
    if args.checkpoint:
        trainer.load_variables(args.checkpoint)
    if args.device_data:
        print(json.dumps(trainer.evaluate("val", device_data=True)))
        return 0
    steps = (len(test_x) + args.batch_size - 1) // args.batch_size
    print(json.dumps(trainer.evaluate("val", num_steps=steps)))
    return 0


def cmd_predict(args) -> int:
    """Batch inference: images (.npy array or a directory of images) ->
    class probabilities (the reference's `model.predict` notebook flow,
    v7 cells 19-25, through the fixed `Training.predict`)."""
    import numpy as np

    from differential_equations_resnet_tpu.train import Training

    model = _build_model(args)
    trainer = Training(model, batch_size=args.batch_size, record_summaries=False)
    if args.checkpoint:
        trainer.load_variables(args.checkpoint)

    if args.input.endswith(".npy"):
        images = np.load(args.input)
    else:
        from differential_equations_resnet_tpu.data.preprocessors import (
            _decode_image_bytes,
            resize_bilinear,
        )
        from differential_equations_resnet_tpu.data.records import get_image_paths

        size = model.config.image_shape[:2]
        paths = get_image_paths([args.input])
        images = np.stack(
            [
                resize_bilinear(
                    _decode_image_bytes(open(p, "rb").read(), 3), size
                )
                for p in paths
            ]
        )
    if images.ndim == 3:
        images = images[None]
    probs = trainer.predict(images.astype(np.float32))
    if args.output:
        np.save(args.output, probs)
        print(f"# wrote {probs.shape} -> {args.output}", file=sys.stderr)
    print(
        json.dumps(
            {
                "num_images": int(len(probs)),
                "predictions": np.argmax(probs, axis=-1)[:32].tolist(),
                "max_prob_mean": float(np.max(probs, axis=-1).mean()),
            }
        )
    )
    return 0


def cmd_benchmark(args) -> int:
    """Steps/sec + batch-1 inference latency — the reference's wall-clock and
    FPS micro-benchmarks (SURVEY.md section 5.1), plus an optional
    jax.profiler trace.

    Timed regions are ended by FETCHING a value that depends on the last
    step (not `block_until_ready`): on remote/tunneled TPU backends dispatch
    is asynchronous and readiness can be acknowledged before device-side
    completion, so only a fetch proves the work ran."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
        make_multi_step,
        make_train_step,
    )

    model = _build_model(args)
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    rng = np.random.default_rng(0)
    image_shape = tuple(model.config.image_shape)
    num_classes = int(model.config.num_classes)
    x = jnp.asarray(
        rng.uniform(0, 255, (args.batch_size,) + image_shape), jnp.float32
    )
    y = jnp.asarray(rng.integers(0, num_classes, (args.batch_size,)))

    scan_k = max(int(args.scan_steps), 0)
    if scan_k > 1:
        # K steps per dispatch inside one lax.scan (the remote-backend fast
        # path); the same pre-staged batch repeats K times.
        multi = make_multi_step(model, tx)
        xs = jnp.broadcast_to(x, (scan_k,) + x.shape)
        ys = jnp.broadcast_to(y, (scan_k,) + y.shape)
        lrs = jnp.full((scan_k,), 1e-3, jnp.float32)
        state, m, _ = multi(state, xs, ys, lrs)
        _ = float(m["loss"][-1])
        chunks = max(args.steps // scan_k, 1)
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        for _ in range(chunks):
            state, m, _ = multi(state, xs, ys, lrs)
        _ = float(m["loss"][-1])  # device-completion sync
        train_sps = chunks * scan_k / (time.perf_counter() - t0)
        if args.profile_dir:
            jax.profiler.stop_trace()
    else:
        step = make_train_step(model, tx)
        for _ in range(5):
            state, m, _ = step(state, x, y, 1e-3)
        _ = float(m["loss"])

        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m, _ = step(state, x, y, 1e-3)
        _ = float(m["loss"])  # device-completion sync
        train_sps = args.steps / (time.perf_counter() - t0)
        if args.profile_dir:
            jax.profiler.stop_trace()

    # Batch-1 inference (v7 notebook cells 19-25): pipelined throughput over
    # 100 dispatches, synced by fetching a scalar of the final output.
    @jax.jit
    def fwd(params, model_state, images):
        out, _ = model.apply(params, model_state, images)
        return out

    x1 = x[:1]
    _ = float(fwd(state.params, state.model_state, x1)[0, 0])
    t0 = time.perf_counter()
    for _ in range(100):
        out = fwd(state.params, state.model_state, x1)
    _ = float(out[0, 0])  # device-completion sync
    latency_ms = (time.perf_counter() - t0) / 100 * 1e3

    out = {
        "train_steps_per_sec": round(train_sps, 3),
        "train_img_per_sec": round(train_sps * args.batch_size, 1),
        "inference_latency_batch1_ms": round(latency_ms, 4),
        "inference_fps_batch1": round(1e3 / latency_ms, 1),
        "device": str(jax.devices()[0]),
    }
    # Absolute-utilization accounting (same convention as bench.py: nominal
    # MODEL FLOPs over the v5e bf16 peak) — single-block family only; the
    # bottleneck presets have no nominal-FLOPs model here.
    from differential_equations_resnet_tpu.models import SingleBlockResNetConfig

    if isinstance(model.config, SingleBlockResNetConfig):
        from differential_equations_resnet_tpu.utils.flops import (
            mfu,
            single_block_train_flops,
        )

        flops_step = single_block_train_flops(model.config, args.batch_size)
        out["model_flops_per_step"] = flops_step
        out["model_tflops"] = round(flops_step * train_sps / 1e12, 2)
        out["mfu_vs_bf16_peak"] = round(mfu(flops_step, train_sps), 4)
    print(json.dumps(out))
    return 0


def _gradient_flow_diagnostics(th):
    """The reference's three gradient-flow diagnostics (v7 notebook cells
    30/34/38) from a TrainingHistory, under one shared key spelling for
    every CLI consumer (analyze prefixes them with 'gradient_norm_')."""
    return {
        "relative_deviation": float(th.gradient_norm_relative_deviation()),
        "standard_deviation": float(th.gradient_norm_standard_deviation()),
        "last_first_ratio": float(th.gradient_norm_relative_comparison()),
    }


def cmd_analyze(args) -> int:
    from differential_equations_resnet_tpu.train import TrainingHistory

    th = TrainingHistory(
        training_history_filepath=args.training_csv,
        evaluation_history_filepath=args.evaluation_csv,
    )
    out = {
        f"gradient_norm_{k}": v
        for k, v in _gradient_flow_diagnostics(th).items()
    }
    if args.evaluation_csv:
        out["best_val_accuracy"] = float(th.evaluation_accuracy.max())
        out["best_val_mean_loss"] = float(th.evaluation_mean_loss.min())
    print(json.dumps(out))
    return 0


def cmd_deep_stability(args) -> int:
    """The deep-stability configuration (BASELINE.md): gamma sweep on the
    100-Euler-step model + conv-matrix eigenvalue spectrum check."""
    import jax

    from differential_equations_resnet_tpu.experiments import (
        conv_matrix_spectrum,
        gamma_sweep,
    )
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        init_antisym_3x3,
    )

    gammas = [float(g) for g in args.gammas.split(",")]
    sweep = gamma_sweep(
        gammas=gammas,
        num_layers=args.num_layers,
        num_filters=args.num_filters,
        train_steps=args.steps,
    )
    spectrum = conv_matrix_spectrum(
        init_antisym_3x3(jax.random.key(0), args.num_filters),
        gamma=gammas[-1],
        height=args.grid,
        width=args.grid,
    )
    print(
        json.dumps(
            {
                "gamma_sweep": {str(k): v for k, v in sweep.items()},
                "spectrum": {
                    "gamma": gammas[-1],
                    "real_part_error": float(spectrum["real_part_error"]),
                    "antisymmetry_defect": float(spectrum["antisymmetry_defect"]),
                },
            }
        )
    )
    return 0


def cmd_sweep(args) -> int:
    """Width x depth train-throughput sweep (BASELINE.md v5e config)."""
    import jax.numpy as jnp

    from differential_equations_resnet_tpu.experiments import width_depth_sweep

    results = width_depth_sweep(
        widths=[int(w) for w in args.widths.split(",")],
        depths=[int(d) for d in args.depths.split(",")],
        batch_size=args.batch_size,
        num_classes=args.num_classes,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        steps=args.steps,
        kernel_type=args.kernel_type,
        remat=args.remat,
    )
    print(json.dumps({f"{w}x{d}": v for (w, d), v in results.items()}))
    return 0


def cmd_convert_records(args) -> int:
    from differential_equations_resnet_tpu.data import RecordGenerator

    gen = RecordGenerator()
    gen.convert(
        input_directory=args.input,
        output_directory=args.output,
        prefix=args.prefix,
        num_files_per_record=args.shard_size,
        train_val_split=args.val_split,
        store_raw_arrays=args.raw,
    )
    return 0


def cmd_fetch_cifar10(args) -> int:
    from differential_equations_resnet_tpu.data.cifar10 import fetch_cifar10

    path = fetch_cifar10(args.dest, verify=not args.no_verify)
    print(json.dumps({"cifar10_dir": path}))
    return 0


# The three published reference configs with their best-val-accuracy baselines
# (BASELINE.md rows 1-3; reference numerical_results/csv/*_evaluation_metrics.csv)
# and the gradient-flow diagnostic baselines (BASELINE.md rows 6-8; v7 notebook
# cells 30/34/38 — the experiment's actual product: flat per-layer gradient
# norms across depth).
REFERENCE_RUNS = (
    ("antisymmetric", 16, 0.5526,
     {"relative_deviation": 1.1399, "standard_deviation": 1.25e-4,
      "last_first_ratio": 2.742}),
    ("regular", 16, 0.6047,
     {"relative_deviation": 1.0606, "standard_deviation": 2.4e-5,
      "last_first_ratio": 1.243}),
    ("regular", 8, 0.4954,
     {"relative_deviation": 1.1016, "standard_deviation": 1.51e-4,
      "last_first_ratio": 1.428}),
)


def _gradient_flow_vs_baseline(csv_dir, run_name, grad_baseline):
    """The three gradient-flow diagnostics of the run's just-written training
    CSV next to the reference's published values (v7 notebook cells
    30/34/38) — the full north-star check (accuracy AND gradient-flow
    statistics) in one reproduce invocation.  The baselines are only
    comparable for real-data full-length runs."""
    import glob
    import os

    from differential_equations_resnet_tpu.train import TrainingHistory

    csvs = sorted(
        glob.glob(os.path.join(csv_dir, f"{run_name}*training*.csv")),
        key=os.path.getmtime,
    )
    measured = None
    if csvs:
        try:
            th = TrainingHistory(training_history_filepath=csvs[-1])
            measured = _gradient_flow_diagnostics(th)
        except ValueError:
            # Zero telemetry rows (run shorter than summaries_frequency).
            pass
    return {"measured": measured, "baseline": grad_baseline}


def cmd_reproduce(args) -> int:
    """Reproduce the reference's three 21-epoch CIFAR-10 runs (v7 notebook
    cells 1-8: 64 layers, h=8/64, batch 32, Adam lr=1e-3, no augmentation)
    and report best val accuracy vs the published baselines with the
    +-0.5% acceptance criterion (BASELINE.md north star), plus the three
    gradient-flow diagnostics vs their published values (v7 cells
    30/34/38)."""
    import os

    from differential_equations_resnet_tpu.data.cifar10 import (
        build_cifar10_dataset,
        fetch_cifar10,
        find_cifar10_directory,
        synthetic_cifar10,
    )
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.train import Training

    cifar_dir = args.cifar10_dir or find_cifar10_directory()
    if cifar_dir is None and not args.synthetic:
        try:
            cifar_dir = fetch_cifar10()
        except RuntimeError as e:
            raise SystemExit(
                f"{e}\nReal CIFAR-10 is required for a reproduction run; "
                f"pass --synthetic only for pipeline smoke-testing."
            )
    if cifar_dir:
        print(f"# loading CIFAR-10 from {cifar_dir}", file=sys.stderr)
        train_x, train_y, test_x, test_y, _ = build_cifar10_dataset(cifar_dir)
        data_kind = "real"
    else:
        print("# SYNTHETIC data: results will NOT match the baselines",
              file=sys.stderr)
        train_x, train_y, test_x, test_y, _ = synthetic_cifar10(
            num_train=args.synthetic_train_size or 50000,
            num_test=args.synthetic_val_size or 10000,
        )
        data_kind = "synthetic"

    batch = 32
    steps_per_epoch = args.steps_per_epoch or (
        (len(train_x) + batch - 1) // batch  # 1563 for the full 50k set
    )
    if args.device_data:
        steps_per_epoch = min(steps_per_epoch, len(train_x) // batch)
    eval_steps = (len(test_x) + batch - 1) // batch
    os.makedirs(args.csv_dir, exist_ok=True)

    results = []
    runs = [r for r in REFERENCE_RUNS
            if args.only is None
            or f"{r[0]}_{r[1]}" == args.only]
    for kernel_type, num_filters, baseline, grad_baseline in runs:
        name = f"single_block_{kernel_type}_64-layers_{num_filters}-filters"
        print(f"# === {name} (baseline best val acc {baseline}) ===",
              file=sys.stderr)
        config = cifar10_single_block_config(
            num_layers=64, final_time=8.0, num_filters=num_filters,
            kernel_type=kernel_type,
        )
        model = build_single_block_resnet(config)
        trainer = Training(
            model,
            train_features=train_x, train_labels=train_y,
            val_features=test_x, val_labels=test_y,
            batch_size=batch,
            csv_logger_dir=args.csv_dir,
            csv_logger_name=name,
        )
        trainer.train(
            epochs=args.epochs,
            steps_per_epoch=steps_per_epoch,
            learning_rate_schedule=lambda step: 1e-3,
            eval_steps=eval_steps,
            summaries_frequency=args.summaries_frequency,
            scan_steps=args.scan_steps,
            device_data=args.device_data,
            save_during_training=args.save_dir is not None,
            save_dir=(os.path.join(args.save_dir, name)
                      if args.save_dir else None),
            monitor="loss",
        )
        best_acc = trainer.best_metrics["accuracy"]
        delta = best_acc - baseline
        results.append({
            "run": name,
            "data": data_kind,
            "best_val_accuracy": best_acc,
            "best_val_loss": trainer.best_metrics["loss"],
            "baseline_accuracy": baseline,
            "delta": delta,
            "within_half_percent": bool(abs(delta) <= 0.005 or delta > 0),
            "gradient_flow": _gradient_flow_vs_baseline(
                args.csv_dir, name, grad_baseline
            ),
        })
        trainer.close()
        print(json.dumps(results[-1]), file=sys.stderr)
    print(json.dumps({"data": data_kind, "runs": results}))
    return 0


def cmd_export(args) -> int:
    """Serving export (the analogue of the reference's tf.saved_model backend,
    training/training.py:781-858): write a self-contained directory with the
    model config, the parameters, and (optionally) the forward function
    serialized as StableHLO via jax.export for runtime-independent serving."""
    from differential_equations_resnet_tpu.utils.serving import export_model

    model = _build_model(args)
    path = export_model(
        model,
        args.output,
        checkpoint=args.checkpoint,
        batch_size=args.batch_size,
        stablehlo=not args.no_stablehlo,
        quantize="int8" if args.int8 else None,
    )
    print(json.dumps({"export_dir": path}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="deqres", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train")
    _add_model_args(p)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--eval-steps", type=int, default=None,
                   help="evaluation batches per eval (default: one full pass)")
    p.add_argument("--eval-dataset", choices=["train", "val"], default="val",
                   help="dataset evaluated between epochs (the reference "
                        "also supports evaluating on the training set)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: split each batch into this "
                        "many sequential microbatches and apply ONE averaged "
                        "update — identical numerics to the monolithic step "
                        "for BN-free models (with batch norm each microbatch "
                        "normalizes by its own statistics), peak activation "
                        "memory of one microbatch (effective batches beyond "
                        "HBM capacity)")
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear lr warmup over this many steps, then "
                        "constant --learning-rate (0 = off). Measured: "
                        "Goyal-scaled large-batch lrs need warmup — with "
                        "int8-forward it turned eval acc 0.205 into 1.0 at "
                        "lr 8e-3 (docs/RESULTS.md section 6f)")
    p.add_argument("--cifar10-dir", default=None)
    p.add_argument("--synthetic-train-size", type=int, default=None,
                   help="synthetic-fallback dataset size (default 50000)")
    p.add_argument("--synthetic-val-size", type=int, default=None)
    p.add_argument("--csv-dir", default="./local/csv_logger")
    p.add_argument("--summaries-dir", default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--monitor", choices=["loss", "accuracy"], default="loss")
    p.add_argument("--summaries-frequency", type=int, default=10)
    p.add_argument("--scan-steps", type=int, default=0,
                   help="K>1: run K train steps per dispatch via lax.scan")
    p.add_argument("--device-data", action="store_true",
                   help="device-resident mode: upload the dataset once and "
                        "run each epoch (shuffle + gather + all steps + "
                        "telemetry) as ONE XLA dispatch")
    p.add_argument("--save-frequency", type=int, default=1,
                   help="checkpoint every N epochs (when --save-dir is set)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint in --save-dir "
                        "(full TrainState incl. Adam slots) before training")
    p.set_defaults(fn=cmd_train, needs_accelerator=True)

    p = sub.add_parser("evaluate")
    _add_model_args(p)
    p.add_argument("--device-data", action="store_true",
                   help="full-pass device-resident evaluation: the dataset "
                        "lives in HBM and the whole pass is one dispatch")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cifar10-dir", default=None)
    p.add_argument("--synthetic-train-size", type=int, default=None)
    p.add_argument("--synthetic-val-size", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.set_defaults(fn=cmd_evaluate, needs_accelerator=True)

    p = sub.add_parser("predict")
    _add_model_args(p)
    p.add_argument("input", help=".npy image array (N,H,W,3) or image directory")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--output", default=None, help="write probabilities .npy")
    p.set_defaults(fn=cmd_predict, needs_accelerator=True)

    p = sub.add_parser("benchmark")
    _add_model_args(p)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--scan-steps", type=int, default=0,
                   help="K>1: run K steps per dispatch via make_multi_step")
    p.add_argument("--profile-dir", default=None)
    p.set_defaults(fn=cmd_benchmark, needs_accelerator=True)

    p = sub.add_parser("analyze")
    p.add_argument("training_csv")
    p.add_argument("--evaluation-csv", default=None)
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("deep-stability")
    p.add_argument("--gammas", default="0.0,0.05,0.2")
    p.add_argument("--num-layers", type=int, default=100)
    p.add_argument("--num-filters", type=int, default=8)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--grid", type=int, default=6)
    p.set_defaults(fn=cmd_deep_stability, needs_accelerator=True)

    p = sub.add_parser("sweep")
    p.add_argument("--widths", default="16,32,64")
    p.add_argument("--depths", default="16,32,64")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--kernel-type",
                   choices=["antisymmetric", "regular"], default="antisymmetric")
    remat_group = p.add_mutually_exclusive_group()
    remat_group.add_argument(
        "--remat", action="store_true", default=None, dest="remat",
        help="force rematerialization on every cell (costs a measured "
             "~13 MFU points at wide/deep shapes)")
    remat_group.add_argument(
        "--no-remat", action="store_false", dest="remat",
        help="force rematerialization off (cells past the no-remat "
             "capacity will fail to compile)")
    p.set_defaults(fn=cmd_sweep, needs_accelerator=True)

    p = sub.add_parser("convert-records")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--prefix", default="")
    p.add_argument("--shard-size", type=int, default=1000)
    p.add_argument("--val-split", type=float, default=None)
    p.add_argument("--raw", action="store_true")
    p.set_defaults(fn=cmd_convert_records)

    p = sub.add_parser(
        "fetch-cifar10",
        help="download + sha256-verify + extract the official CIFAR-10 "
             "release (needs egress; see fetch_cifar10 docstring for the "
             "zero-egress fallback)",
    )
    p.add_argument("--dest", default="/root/data")
    p.add_argument("--no-verify", action="store_true")
    p.set_defaults(fn=cmd_fetch_cifar10)

    p = sub.add_parser(
        "reproduce",
        help="run the reference's three 21-epoch CIFAR-10 configs and "
             "compare best val accuracy to the published baselines",
    )
    p.add_argument("--cifar10-dir", default=None)
    p.add_argument("--epochs", type=int, default=21)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--scan-steps", type=int, default=50)
    p.add_argument("--device-data", action="store_true",
                   help="device-resident epochs (fastest; floor(N/batch) "
                        "steps per epoch)")
    p.add_argument("--csv-dir", default="./numerical_results/csv")
    p.add_argument("--summaries-frequency", type=int, default=10,
                   help="telemetry CSV row every N steps (the reference "
                        "logged every 10)")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--only", default=None,
                   choices=[f"{k}_{f}" for k, f, *_ in REFERENCE_RUNS],
                   help="run a single config, e.g. antisymmetric_16")
    p.add_argument("--synthetic", action="store_true",
                   help="allow synthetic data (pipeline smoke only)")
    p.add_argument("--synthetic-train-size", type=int, default=None,
                   help="synthetic dataset size for smoke runs")
    p.add_argument("--synthetic-val-size", type=int, default=None)
    p.set_defaults(fn=cmd_reproduce, needs_accelerator=True)

    p = sub.add_parser(
        "export",
        help="serving export: config + params + StableHLO forward "
             "(tf.saved_model analogue)",
    )
    _add_model_args(p)
    p.add_argument("output", help="export directory to create")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--no-stablehlo", action="store_true")
    p.add_argument(
        "--int8",
        action="store_true",
        help="export the forward with dynamic-w8a8 int8 identity trunks "
             "(measured full-model 1.68x over bf16 at lane-filling trunk "
             "widths, C >= 128)",
    )
    p.set_defaults(fn=cmd_export, needs_accelerator=True)

    args = parser.parse_args(argv)
    if getattr(args, "needs_accelerator", False):
        # Persistent XLA compilation cache: repeat CLI runs load the
        # serialized train-step executable in <1 s instead of recompiling
        # (tens of seconds, highly load-variable on tunneled backends).
        # The cache setup probes `jax.default_backend()`, which initializes
        # the backend (on TPU hosts: grabs the accelerator) — so it only
        # runs for subcommands that declare needs_accelerator in their
        # set_defaults, never for `--help`, argparse errors, or host-only
        # subcommands.  DEQRES_COMPILE_CACHE=0 opts out
        # (utils/compile_cache.py).
        from differential_equations_resnet_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
