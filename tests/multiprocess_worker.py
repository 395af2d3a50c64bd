"""Worker for the real multi-process distributed test (not collected by
pytest — spawned by test_distributed.py::test_two_process_equivalence).

Each process: 4 virtual CPU devices, jax.distributed.initialize via the
framework's env://-style rendezvous, DistributedTrainer over the global
8-device dp×ep×tp mesh, two train steps on the same deterministic batch,
prints the final loss. Gloo carries the cross-process collectives.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

from deepearth_tpu.training.distributed import (  # noqa: E402
    DistributedTrainer,
    initialize_distributed,
)

# env:// rendezvous parity: the same variables scripts/launch_pod.sh sets
os.environ["MASTER_ADDR"] = "127.0.0.1"
os.environ["MASTER_PORT"] = port
os.environ["WORLD_SIZE"] = str(n)
os.environ["RANK"] = str(pid)
initialize_distributed()
assert jax.process_count() == n, jax.process_count()
assert jax.device_count() == 4 * n and jax.local_device_count() == 4

import numpy as np  # noqa: E402

from test_distributed import dp_ep_tp_config, make_batch  # noqa: E402
from deepearth_tpu.models import DeepEarthModel  # noqa: E402
from deepearth_tpu.parallel import create_mesh  # noqa: E402
from deepearth_tpu.training import LossWeights  # noqa: E402

from deepearth_tpu.parallel.mesh import process_local_batch_indices  # noqa: E402

cfg = dp_ep_tp_config()
model = DeepEarthModel(cfg)
trainer = DistributedTrainer(
    model, cfg, LossWeights(contrastive=0.0), mesh=create_mesh(jax.devices()),
    seed=0,
)
B = 16
batch = make_batch(B)  # deterministic (PRNGKey(0)) on every process
state = trainer.init_state(batch)
metrics = None
for _ in range(2):
    state, metrics = trainer.step(state, batch)
print(f"RESULT {float(np.asarray(metrics['loss/total'])):.6f}", flush=True)

# Same two steps again, but each process contributes ONLY its local rows
# (the production multi-host input path) — must reproduce the replicated
# feed exactly.
idx = process_local_batch_indices(B)
local = {
    "xyzt": np.asarray(batch["xyzt"])[idx],
    "modalities": {
        k: np.asarray(v)[idx] for k, v in batch["modalities"].items()
    },
}
ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
trainer2 = DistributedTrainer(
    model, cfg, LossWeights(contrastive=0.0), mesh=create_mesh(jax.devices()),
    seed=0, checkpoint_dir=ckpt_dir,
)
state2 = trainer2.init_state(batch)
for _ in range(2):
    state2, metrics2 = trainer2.step(state2, local, local_of=B)
print(f"RESULT2 {float(np.asarray(metrics2['loss/total'])):.6f}", flush=True)

if ckpt_dir:
    # multi-process sharded checkpoint: every process writes its shards
    # (orbax coordinates through the initialized distributed runtime),
    # then a FRESH trainer restores into the sharded state and resumes
    trainer2.save(state2, 2)
    trainer3 = DistributedTrainer(
        model, cfg, LossWeights(contrastive=0.0),
        mesh=create_mesh(jax.devices()), seed=0, checkpoint_dir=ckpt_dir,
    )
    state3 = trainer3.init_state(batch)
    state3 = trainer3.restore(state3)
    state3, metrics3 = trainer3.step(state3, local, local_of=B)
    print(f"RESULT3 {float(np.asarray(metrics3['loss/total'])):.6f}", flush=True)
