"""differential_equations_resnet_tpu — a TPU-native JAX framework for
ODE-interpreted residual networks ("stable architectures", Haber & Ruthotto,
arXiv:1705.03341).

A ground-up, TPU-first rebuild of the capabilities of
`pierluigiferrari/differential_equations_resnet` (TF 1.12 / tf.keras):

- ``ops.antisymmetric``  — packed skew-centrosymmetric conv kernels (the
  stability-enforcing K - K^T - gamma*I convolution operator), materialized as a
  single vectorized scatter instead of the reference's O(C^2) per-variable
  graph assembly (reference: layers/tfkeras_layer_Conv2DAntisymmetric3By3.py).
- ``ops.integrators``    — residual blocks as explicit time-integrator steps
  (forward Euler / midpoint / RK4) of dY/dt = sigma(K(t) Y + b), run as
  ``lax.scan`` over stacked per-layer parameters.
- ``ops.pallas``         — fused Pallas TPU kernels for the hot paths.
- ``models``             — single-block ResNets and bottleneck ResNet-50/101/152
  (reference: models/tfkeras_resnets.py), as pure init/apply functions.
- ``data``               — tf.data-free NumPy data pipeline: CIFAR-10 loader,
  composable preprocessors, sharded binary record IO.
- ``train``              — functional training harness: jit/pjit train step,
  streaming metrics, per-layer gradient-norm telemetry, CSV/TensorBoard-style
  logging, Orbax checkpointing, TrainingHistory analysis.
- ``parallel``           — device mesh + sharding (data parallel over ICI via
  XLA collectives; optional channel/tensor sharding).
- ``utils``              — weight surgery (pickling, depth-doubling
  continuation) as pytree transforms.
"""

__version__ = "0.1.0"

from differential_equations_resnet_tpu import ops  # noqa: F401
