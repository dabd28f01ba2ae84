from gym_flock_tpu.compat.gym_api import (
    FlattenDictWrapper,
    LegacyEnv,
    load_cfg_section,
    make_legacy,
)
from gym_flock_tpu.compat.gymnasium_api import GymnasiumEnv, make_gymnasium
from gym_flock_tpu.compat.gymnasium_vector import (
    GymnasiumVectorEnv,
    make_gymnasium_vector,
)
