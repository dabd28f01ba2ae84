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
from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams, CoverageState
from gym_flock_tpu.envs.shepherding import ShepherdingEnv, ShepherdingParams
from gym_flock_tpu.envs.formation import FormationFlyingEnv, FormationParams
from gym_flock_tpu.envs.lqr import LQREnv, LQRParams
from gym_flock_tpu.envs.flocking import LargeFlockingEnv, SparseFlockingEnv
from gym_flock_tpu.envs.mapping import (
    MappingEnv,
    MappingVelEnv,
    MappingDiscEnv,
    MappingLocalEnv,
    MappingParams,
    MappingState,
)
from gym_flock_tpu.envs.flocking_multi import (
    FlockingMultiEnv,
    FlockingMultiParams,
    FlockingMultiState,
)
