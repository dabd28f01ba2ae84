"""Two-process jax.distributed validation of the multi-host path."""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2] if len(sys.argv) > 2 else "9873"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from gym_flock_tpu.parallel.distributed import initialize, global_env_mesh, host_fold, local_shard_size

initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 2 procs x 4 local

import jax.numpy as jnp
import numpy as np
import gym_flock_tpu as gft
from gym_flock_tpu.parallel import FlockingImitationTrainer

mesh = global_env_mesh("dp")
env, params = gft.make("FlockingRelative-v0", n_agents=8)
trainer = FlockingImitationTrainer(env, params)
step, _ = trainer.make_sharded_train_step(mesh=mesh, n_envs=8, n_steps=2)
carry = trainer.init(jax.random.key(0))
carry, loss = step(carry, jax.random.key(1))

# loss is replicated across processes; read the local shard
val = (
    float(loss.addressable_data(0))
    if hasattr(loss, "addressable_data")
    else float(loss)
)
k = host_fold(jax.random.key(0))
print(f"[proc {proc_id}] devices={len(jax.devices())} local={len(jax.local_devices())} "
      f"loss={val:.4f} shard={local_shard_size(16)} host_key_ok={k.shape == ()}", flush=True)
