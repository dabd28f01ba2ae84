from gym_flock_tpu.envs.flocking import (
    FlockingRelativeEnv,
    FlockingAbsoluteEnv,
    FlockingLeaderEnv,
    FlockingObstacleEnv,
    FlockingStochasticEnv,
    FlockingTwoFlocksEnv,
    FlockingParams,
    FlockingState,
)
