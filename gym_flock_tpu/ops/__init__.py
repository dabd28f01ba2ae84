from gym_flock_tpu.ops.pairwise import (
    pos_diff,
    pairwise_sq_dists,
    radius_adjacency,
    mean_pool_normalize,
    radius_edges_masked,
    knn_edges,
    nodes_within_radius,
)
from gym_flock_tpu.ops.pallas_flocking import (
    flocking_sums,
    turner_controller_large,
    flocking_features_large,
    adjacency_matmul,
    khop_aggregate,
)
