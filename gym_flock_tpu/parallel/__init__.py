from gym_flock_tpu.parallel.rollout import (
    rollout,
    batch_rollout,
    sharded_rollout,
    make_env_mesh,
)
from gym_flock_tpu.parallel.train import FlockingImitationTrainer, collect_flocking_batch
from gym_flock_tpu.parallel.train import save_checkpoint, restore_checkpoint
from gym_flock_tpu.parallel.distributed import (
    initialize as distributed_initialize,
    global_env_mesh,
    host_fold,
)
from gym_flock_tpu.parallel.train_coverage import CoverageImitationTrainer
from gym_flock_tpu.parallel.dagger import DaggerTrainer, DaggerState
