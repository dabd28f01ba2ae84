from gym_flock_tpu.compat.gym_api import make_legacy, LegacyEnv, FlattenDictWrapper
