from gym_flock_tpu.parallel.rollout import (
    rollout,
    batch_rollout,
    sharded_rollout,
    make_env_mesh,
)
