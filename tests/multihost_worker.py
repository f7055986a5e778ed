"""Worker process for the 2-process multi-host smoke test.

Each process owns 4 virtual CPU devices; together they form one 8-device
global 'data' mesh.  Exercises jax.distributed initialization, per-host
input sharding (`local_batch_slice` + `jax.make_array_from_process_local_data`),
a cross-process collective (global sum over the data axis), one global
data-parallel train step on a tiny model, the EXPLICIT-collective shard_map
train step (plain and gradient-accumulating) parity-checked against it, and
a sharding-preserving checkpoint save/restore where each process writes and
reads only its addressable shards (VERDICT r3 item 7).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <ckpt_dir>
"""

import os
import sys

process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ckpt_dir = sys.argv[4]

# Force exactly 4 local devices, overriding any inherited count (pytest's
# conftest exports an 8-device flag that children would otherwise inherit).
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from differential_equations_resnet_tpu.parallel import (  # noqa: E402
    create_mesh,
    initialize_multihost,
    local_batch_slice,
)

initialize_multihost(f"127.0.0.1:{port}", num_processes, process_id)
assert jax.process_count() == num_processes, jax.process_count()
assert jax.device_count() == 4 * num_processes
assert len(jax.local_devices()) == 4

mesh = create_mesh((jax.device_count(),), ("data",))
data_sharding = NamedSharding(mesh, P("data"))

# --- per-host input sharding + cross-process collective --------------------
global_batch = 16
sl = local_batch_slice(global_batch)
full = np.arange(global_batch, dtype=np.float32)[:, None] * np.ones(
    (1, 4), np.float32
)
local = full[sl]
arr = jax.make_array_from_process_local_data(data_sharding, local, full.shape)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(np.asarray(jax.device_get(total)), full.sum())

# --- one global DP train step on a tiny model ------------------------------
from differential_equations_resnet_tpu.models import (  # noqa: E402
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.train import (  # noqa: E402
    create_train_state,
    make_adam,
    make_train_step,
)

model = build_single_block_resnet(
    cifar10_single_block_config(num_layers=2, num_filters=8)
)
tx = make_adam()
state = create_train_state(model, jax.random.key(0), tx)
replicated = NamedSharding(mesh, P())
# Replicate the state globally: every process supplies identical host values.
state = jax.tree.map(
    lambda a: jax.make_array_from_process_local_data(
        replicated, np.asarray(a), np.shape(a)
    ),
    state,
)

rng = np.random.default_rng(0)
x_full = rng.uniform(0, 255, (global_batch, 32, 32, 3)).astype(np.float32)
y_full = rng.integers(0, 10, (global_batch,))
x = jax.make_array_from_process_local_data(data_sharding, x_full[sl], x_full.shape)
y = jax.make_array_from_process_local_data(data_sharding, y_full[sl], y_full.shape)

step = make_train_step(model, tx, mesh=mesh, donate=False)
new_state, metrics, grad_norms = step(state, x, y, 1e-3)
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss)
assert int(jax.device_get(new_state.step)) == 1

# --- explicit-collective (shard_map) train step across processes ------------
# Same state/batch through make_shard_map_train_step: the lax.pmean gradient
# reduction now spans BOTH processes' devices, and the resulting loss must
# match the jit-sharded step's.  The accumulating variant splits each
# device's 2-row local shard into 2 microbatches and must still agree
# (monolithic-equivalence across processes).
from differential_equations_resnet_tpu.parallel import (  # noqa: E402
    make_shard_map_train_step,
)

sm_step = make_shard_map_train_step(model, tx, mesh, donate=False)
sm_state, sm_metrics, _ = sm_step(state, x, y, jnp.float32(1e-3))
sm_loss = float(jax.device_get(sm_metrics["loss"]))
np.testing.assert_allclose(sm_loss, loss, rtol=1e-5)

sm_accum = make_shard_map_train_step(
    model, tx, mesh, donate=False, accum_steps=2
)
_, acc_metrics, _ = sm_accum(state, x, y, jnp.float32(1e-3))
np.testing.assert_allclose(
    float(jax.device_get(acc_metrics["loss"])), loss, rtol=1e-5
)
for a, b in zip(jax.tree.leaves(sm_state.params), jax.tree.leaves(new_state.params)):
    np.testing.assert_allclose(
        np.asarray(jax.device_get(a.addressable_shards[0].data)),
        np.asarray(jax.device_get(b.addressable_shards[0].data)),
        rtol=2e-4, atol=1e-6,
    )

# --- sharding-preserving checkpoint across processes ------------------------
# Save {post-step TrainState, the cross-process data-sharded batch}: Orbax
# writes each shard from the process holding it (no host gather), and the
# restore reads each process's addressable shards straight back onto its
# devices.  Restored shards must match bit-for-bit on EVERY process.
# NO caller-side barrier between save and restore: save() is itself a
# collective (the sidecar + GC barrier inside Checkpointer.save), and this
# immediate cross-process restore is the regression test for that contract
# — with the internal barrier removed, a non-zero process can observe a
# missing .meta.json or a mid-GC directory here.
from differential_equations_resnet_tpu.train.checkpoint import (  # noqa: E402
    Checkpointer,
)

payload = {"state": new_state, "batch": x}
ckpt = Checkpointer(ckpt_dir, backend="orbax", max_to_keep=2)
path = ckpt.save(payload, step=1, name="mh", preserve_shardings=True)
meta = ckpt.read_meta(path)
assert meta is not None and meta["step"] == 1, meta
restored = ckpt.restore(payload, path=path, preserve_shardings=True)
for a, b in zip(jax.tree.leaves(payload), jax.tree.leaves(restored)):
    assert b.sharding == a.sharding, (a.sharding, b.sharding)
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sa.data)),
            np.asarray(jax.device_get(sb.data)),
        )

print(f"MULTIHOST_OK {process_id} loss={loss:.4f}", flush=True)
