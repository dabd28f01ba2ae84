from gym_flock_tpu.models.gnn import (
    AggregationGNN,
    EdgeGraphNet,
    unpack_obs,
)
