from gym_flock_tpu.models.gnn import (
    get_number_nodes,
    AggregationGNN,
    LargeAggregationGNN,
    EdgeGraphNet,
    unpack_obs,
    unpack_obs_state,
)
