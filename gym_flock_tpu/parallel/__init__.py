from gym_flock_tpu.parallel.rollout import (
    rollout,
    batch_expert_rollout,
    batch_rollout,
    sharded_rollout,
    make_env_mesh,
)
from gym_flock_tpu.parallel.train import (
    FlockingImitationTrainer,
    LargeFlockingImitationTrainer,
    collect_flocking_batch,
    collect_large_flocking_batch,
)
from gym_flock_tpu.parallel.train import save_checkpoint, restore_checkpoint
from gym_flock_tpu.parallel.distributed import (
    initialize as distributed_initialize,
    global_env_mesh,
    host_fold,
)
from gym_flock_tpu.parallel.train_coverage import (
    CoverageDaggerTrainer,
    CoverageImitationTrainer,
)
from gym_flock_tpu.parallel.vrp_labels import (
    collect_vrp_labeled_batch,
    vrp_label_states,
)
from gym_flock_tpu.parallel.dagger import DaggerTrainer, DaggerState
from gym_flock_tpu.parallel.agent_shard import (
    make_flock_mesh,
    flocking_sums_sharded,
    flocking_features_sharded,
    turner_controller_sharded,
    adjacency_matmul_sharded,
    flocking_step_sharded,
    flocking_reset_sharded,
    agent_sharded_rollout,
)
