from gym_flock_tpu.parallel.rollout import (
    rollout,
    batch_rollout,
    sharded_rollout,
    make_env_mesh,
)
from gym_flock_tpu.parallel.train import FlockingImitationTrainer, collect_flocking_batch
