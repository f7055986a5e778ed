"""Minimal repro for the int8-'full' no-remat near-HBM-capacity NaN defect.

docs/RESULTS.md section 6g (round 4) records a suspected XLA/runtime defect:
the int8_backward='full' train step WITHOUT remat produces a finite
first-step loss and NaN from step 2 once the saved int8 residual stack
crosses ~11 GB on a 16 GB v5e — at ANY learning rate — while the remat twin
of the exact same config runs clean (and bit-matches the 'dgrad'-remat twin
to ~4 digits), exonerating the gradient math (which is also oracle-exact at
the op level, tests/test_quantize.py).  This script is the standalone
escalation artifact: one config per invocation, fixed seeds, a printed
clean/NaN verdict, and the toolchain versions it ran under — so the
boundary can be re-validated after any jax/libtpu bump and attached to an
upstream report.

Measured outcome matrix (v5e-1, jax 0.9.0 / jaxlib 0.9.0 / libtpu 0.0.34,
first measured 2026-08-19, re-validated with this script 2026-08-20 —
128 filters, batch 256, bf16 compute, Adam lr 1e-3, int8_forward=True,
int8_backward='full'; the JSON output pins the executing toolchain):

  | layers | mode  | remat | residual stack | outcome                        |
  |--------|-------|-------|----------------|--------------------------------|
  | 160    | full  | no    | 10.7 GB        | clean (4.18 steps/s)           |
  | 176    | full  | no    | 12.0 GB        | finite step 1, NaN from step 2 |
  | 192    | full  | no    | 12.9 GB        | finite step 1, NaN from step 2 |
  | 192    | full  | yes   | (recomputed)   | clean (68.6 -> 21.2 -> 14.2)   |
  | 192 b64| full  | no    | 4.3 GB         | clean                          |
  | 192    | wgrad | no    | 12.9 GB        | clean (r5: losses match the    |
  |        |       |       |                | remat twin) — the defect needs |
  |        |       |       |                | the int8 DGRAD conv, not the   |
  |        |       |       |                | int8 residual stack alone      |

Run (TPU):
  python examples/int8_full_nan_repro.py                    # 192L, NaN expected
  python examples/int8_full_nan_repro.py --remat            # clean expected
  python examples/int8_full_nan_repro.py --num-layers 160   # clean expected
"""

import _bootstrap  # noqa: F401  (repo-root import shim for source checkouts)
import argparse
import json
import sys


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num-layers", type=int, default=192)
    parser.add_argument("--num-filters", type=int, default=128)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialized twin (expected clean at any "
                             "depth that compiles)")
    parser.add_argument("--int8-backward", default="full",
                        choices=["dgrad", "wgrad", "full"],
                        help="backward mode to probe ('wgrad' shares "
                             "'full''s int8 residual layout, so the same "
                             "boundary question applies — measured round 5, "
                             "see the matrix in docs/RESULTS.md 6g)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from differential_equations_resnet_tpu.experiments import imagenet32_config
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
    )
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
        make_train_step,
    )

    try:
        import jax.lib

        libtpu_ver = getattr(
            __import__("libtpu"), "__version__", "unknown"
        )
    except Exception:
        libtpu_ver = "unknown"
    versions = {
        "jax": jax.__version__,
        "jaxlib": jax.lib.__version__,
        "libtpu": libtpu_ver,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    config = imagenet32_config(
        num_layers=args.num_layers,
        num_filters=args.num_filters,
        int8_forward=True,
        int8_backward=args.int8_backward,
        remat=args.remat,
    )
    model = build_single_block_resnet(config)
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, donate=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 255, (args.batch, 32, 32, 3)), jnp.float32
    )
    y = jnp.asarray(rng.integers(0, 1000, (args.batch,)), jnp.int32)

    # 'full' saves (int8 y + bool mask) = 2 B per trunk activation element.
    residual_gb = (
        2 * args.num_layers * args.batch * 32 * 32 * args.num_filters / 1e9
    )

    losses = []
    for i in range(args.steps):
        state, metrics, _ = step(state, x, y, args.lr)
        losses.append(float(metrics["loss"]))

    finite = [bool(np.isfinite(l)) for l in losses]
    if all(finite):
        verdict = "clean"
    elif finite[0]:
        # The defect's signature: a finite first step, NaN onset later
        # (measured onset is step 2; report the index so a boundary
        # config whose onset slips a step is still labeled correctly).
        onset = finite.index(False) + 1
        verdict = f"finite-then-NaN-from-step-{onset}"
    else:
        verdict = "NaN-from-step-1"  # NOT the defect — check config/lr

    print(json.dumps({
        "config": f"{args.num_layers}Lx{args.num_filters}F_b{args.batch}"
                  f"_int8{args.int8_backward}_remat={args.remat}",
        "residual_stack_gb": round(residual_gb, 2),
        "lr": args.lr,
        "losses": [round(l, 4) for l in losses],
        "verdict": verdict,
        "expected": ("clean"
                     if (args.remat or residual_gb < 11.0
                         or args.int8_backward != "full")
                     else "finite-then-NaN-from-step-2 (defect regime)"),
        "versions": versions,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
