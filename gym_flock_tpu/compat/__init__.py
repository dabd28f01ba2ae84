from gym_flock_tpu.compat.gym_api import (
    FlattenDictWrapper,
    LegacyEnv,
    load_cfg_section,
    make_legacy,
)
