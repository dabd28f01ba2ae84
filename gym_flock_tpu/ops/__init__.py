from gym_flock_tpu.ops.pairwise import (
    pos_diff,
    pairwise_sq_dists,
    radius_adjacency,
    mean_pool_normalize,
    radius_edges_masked,
    knn_edges,
    nodes_within_radius,
)
