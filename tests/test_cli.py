"""CLI surface smoke tests (SURVEY.md section 5.6: the reference had no
config/flag system; the CLI is this framework's notebook-workflow surface).
Runs tiny configurations on the virtual CPU platform."""

import glob
import json
import os

import numpy as np
import pytest

from differential_equations_resnet_tpu.cli import main


def _tiny_train_args(tmp_path, extra=()):
    # Deliberately the SAME model config and batch size as
    # tests/test_train.py's make_trainer (4Lx8F, batch 32): the value-keyed
    # model cache + memoized step builders then share one set of XLA
    # executables across the two files, keeping suite wall time down.
    return [
        "train",
        "--num-layers", "4",
        "--num-filters", "8",
        "--epochs", "1",
        "--steps-per-epoch", "3",
        "--eval-steps", "2",
        "--batch-size", "32",
        "--synthetic-train-size", "256",
        "--synthetic-val-size", "64",
        "--csv-dir", str(tmp_path / "csv"),
        "--summaries-frequency", "1",
        *extra,
    ]


def test_cli_train_analyze_roundtrip(tmp_path, capsys):
    # --warmup-steps exercises the CLI -> linear_warmup_schedule wiring;
    # lr values are host-side schedule outputs, so this reuses the exact
    # same compiled step (zero extra XLA programs).
    assert main(_tiny_train_args(tmp_path, ["--warmup-steps", "2"])) == 0
    (train_csv,) = glob.glob(str(tmp_path / "csv" / "*_training.csv"))
    (eval_csv,) = glob.glob(str(tmp_path / "csv" / "*_evaluation.csv"))
    rows = np.loadtxt(train_csv, skiprows=1)
    assert rows.shape[0] == 3  # one telemetry row per step
    assert main(["analyze", train_csv, "--evaluation-csv", eval_csv]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    diag = json.loads(out)
    assert "gradient_norm_relative_deviation" in diag
    assert "best_val_accuracy" in diag


def test_cli_train_scan_steps_and_resume(tmp_path, capsys):
    save = str(tmp_path / "ckpt")
    # scan-steps 4 over 6 steps = the exact (K=4 chunk + K=2 remainder)
    # programs test_train.py's scan-equivalence case compiles — shared.
    args = _tiny_train_args(
        tmp_path, ["--scan-steps", "4", "--steps-per-epoch", "6",
                   "--save-dir", save, "--save-frequency", "1"]
    )
    assert main(args) == 0
    assert main(args + ["--resume"]) == 0
    err = capsys.readouterr().err
    assert "resumed from" in err


def test_cli_benchmark_smoke(capsys):
    assert main([
        "benchmark", "--num-layers", "2", "--num-filters", "8",
        "--batch-size", "8", "--steps", "4", "--scan-steps", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["train_steps_per_sec"] > 0
    assert out["inference_latency_batch1_ms"] > 0
    # Utilization accounting (bench.py convention) on the single-block family.
    assert out["model_flops_per_step"] > 0
    assert out["model_tflops"] >= 0  # rounds to 0.00 for this tiny config
    assert 0 <= out["mfu_vs_bf16_peak"] <= 1
    assert out["train_img_per_sec"] == pytest.approx(
        out["train_steps_per_sec"] * 8, abs=0.2
    )


def test_cli_deep_stability_smoke(capsys):
    assert main([
        "deep-stability", "--gammas", "0.0,0.1", "--num-layers", "4",
        "--num-filters", "4", "--steps", "2", "--grid", "3",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["gamma_sweep"]) == {"0.0", "0.1"}
    assert out["spectrum"]["antisymmetry_defect"] < 1e-3


def test_cli_convert_records_roundtrip(tmp_path, capsys):
    pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for label in range(3):
        for n in range(4):
            arr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / f"{label}_{n}.png")
    out_dir = tmp_path / "records"
    assert main(["convert-records", str(img_dir), str(out_dir),
                 "--prefix", "t", "--shard-size", "5", "--val-split", "0.25"]) == 0
    from differential_equations_resnet_tpu.data import get_record_paths

    assert get_record_paths(str(out_dir / "train"))
    assert get_record_paths(str(out_dir / "val"))


def test_cli_predict_npy_and_directory(tmp_path, capsys):
    rng = np.random.default_rng(0)
    arr = rng.uniform(0, 255, (5, 32, 32, 3)).astype(np.float32)
    npy = tmp_path / "imgs.npy"
    np.save(npy, arr)
    out_npy = tmp_path / "probs.npy"
    assert main([
        "predict", str(npy), "--num-layers", "2", "--num-filters", "8",
        "--output", str(out_npy),
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["num_images"] == 5
    probs = np.load(out_npy)
    assert probs.shape == (5, 10)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)

    pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for n in range(3):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(img_dir / f"0_{n}.png")
    assert main([
        "predict", str(img_dir), "--num-layers", "2", "--num-filters", "8",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["num_images"] == 3


def test_cli_reproduce_synthetic_smoke(tmp_path, capsys):
    """`reproduce --synthetic` (the north-star pipeline) end-to-end at smoke
    scale: one config, one epoch, tiny synthetic data — the exact code path
    that runs against real CIFAR-10 the moment the dataset exists."""
    # One step + one eval batch: at the reference's full 64-layer depth a
    # single CPU-host train step costs ~16 s of pure execution, so the step
    # count IS the test's wall time (compiles are <1 s — the depth scan
    # compiles once regardless of L).
    assert main([
        "reproduce", "--synthetic", "--only", "regular_8",
        "--epochs", "1", "--steps-per-epoch", "1", "--scan-steps", "0",
        "--synthetic-train-size", "128", "--synthetic-val-size", "32",
        "--summaries-frequency", "1",
        "--csv-dir", str(tmp_path / "csv"),
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["data"] == "synthetic"
    (run,) = out["runs"]
    assert run["run"] == "single_block_regular_64-layers_8-filters"
    assert run["baseline_accuracy"] == 0.4954
    assert 0.0 <= run["best_val_accuracy"] <= 1.0
    # The full north-star check: gradient-flow diagnostics are computed from
    # the run's own CSV and reported next to the published baselines.
    gf = run["gradient_flow"]
    assert gf["baseline"]["relative_deviation"] == 1.1016
    assert gf["measured"]["relative_deviation"] > 0.0
    # The reference-format gradient-history CSV was written.
    files = os.listdir(tmp_path / "csv")
    assert any("regular_64-layers_8-filters" in f and "training" in f
               for f in files)


def test_cli_bf16_flag_sets_compute_dtype():
    """--bf16 flows into compute_dtype for both model families (no compile:
    config-level check only)."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from differential_equations_resnet_tpu.cli import _build_model

    common = dict(
        image_size=32, num_classes=10, resnet_version=1, num_layers=4,
        num_filters=8, final_time=8.0, gamma=0.0, kernel_type="antisymmetric",
        kernel_size=3, integrator="euler", remat=False, use_pallas=False,
        s2d_block=2,
    )
    for family in ("single_block", "resnet50"):
        for bf16, expect in ((True, jnp.bfloat16), (False, jnp.float32)):
            model = _build_model(
                SimpleNamespace(model=family, bf16=bf16, **common)
            )
            assert model.config.compute_dtype == expect, (family, bf16)


def test_cli_export_and_load(tmp_path, capsys):
    """`export` writes a self-contained serving directory (config + params
    [+ StableHLO]) that load_exported can run."""
    out_dir = tmp_path / "exported"
    assert main([
        "export", str(out_dir), "--num-layers", "2", "--num-filters", "8",
        "--batch-size", "2", "--no-stablehlo",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["export_dir"] == str(out_dir)

    from differential_equations_resnet_tpu.utils.serving import load_exported

    predict, manifest = load_exported(str(out_dir))
    assert manifest["family"] == "single_block"
    probs = predict(np.zeros((2, 32, 32, 3), np.float32))
    assert np.asarray(probs).shape == (2, 10)
