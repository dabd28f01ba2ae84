from gym_flock_tpu.core.env import Env, EnvState, EnvTransition, step_autoreset
from gym_flock_tpu.core import spaces
from gym_flock_tpu.core.registry import make, register, registry
