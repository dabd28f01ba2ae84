from gym_flock_tpu.utils.formations import circle, grid, twoflocks, parse_settings
from gym_flock_tpu.utils.profiling import trace, measure_steps_per_second
