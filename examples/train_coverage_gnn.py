"""Train an EdgeGraphNet coverage policy — BC or DAGGER.

The workload of the reference's companion learning repo (reference
README.md:29-30 points spatial-coverage learning at katetolstaya/graph_rl),
entirely on device: greedy-expert (or beta-mixture) rollouts, padded obs
graphs, action-edge cross-entropy.

    python examples/train_coverage_gnn.py --cpu --iters 20
    python examples/train_coverage_gnn.py --dagger --iters 10
    python examples/train_coverage_gnn.py --vrp-labels --workers 4

--vrp-labels trains on host-parallel VRP expert labels (the high-quality
expert labels states the on-device greedy behavior policy visits —
parallel.vrp_labels; the C++ solves fan across a CPU thread pool while
the device collects the next rollout's obs).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Coverage-v0")
    p.add_argument("--graphs", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--dagger", action="store_true",
                   help="DAGGER beta-mixture aggregation instead of plain BC")
    p.add_argument("--vrp-labels", action="store_true",
                   help="label rollout states with the host-parallel VRP "
                        "expert instead of the on-device greedy expert")
    p.add_argument("--workers", type=int, default=4,
                   help="CPU labeling threads for --vrp-labels")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import gym_flock_tpu as gft

    env, params = gft.make(args.env, n_graphs=args.graphs)
    key = jax.random.key(args.seed)

    if args.vrp_labels:
        from gym_flock_tpu.parallel import (
            CoverageImitationTrainer,
            collect_vrp_labeled_batch,
        )

        trainer = CoverageImitationTrainer(env, params, learning_rate=args.lr)
        carry = trainer.init(key)
        losses = []
        for i in range(args.iters):
            key, k = jax.random.split(key)
            batch = collect_vrp_labeled_batch(
                env, params, k, n_envs=args.envs, n_steps=args.steps,
                workers=args.workers,
            )
            carry, loss = trainer.update_from_batch(carry, batch)
            losses.append(float(loss))
        print("VRP-label BC losses:", [round(l, 4) for l in losses])
    elif args.dagger:
        from gym_flock_tpu.parallel import CoverageDaggerTrainer

        trainer = CoverageDaggerTrainer(env, params, learning_rate=args.lr)
        state, losses = trainer.fit(
            key, n_iters=args.iters, n_envs=args.envs, n_steps=args.steps
        )
        print("DAGGER losses:", [round(l, 4) for l in losses])
    else:
        from gym_flock_tpu.parallel import CoverageImitationTrainer

        trainer = CoverageImitationTrainer(env, params, learning_rate=args.lr)
        carry, losses = trainer.fit(
            key, n_iters=args.iters, n_envs=args.envs, n_steps=args.steps
        )
        print("BC losses:", [round(float(l), 4) for l in losses])


if __name__ == "__main__":
    main()
