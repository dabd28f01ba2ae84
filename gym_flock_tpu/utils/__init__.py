from gym_flock_tpu.utils.formations import circle, grid, twoflocks, parse_settings
