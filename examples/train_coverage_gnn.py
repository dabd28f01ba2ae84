"""Train an EdgeGraphNet coverage policy — BC or DAGGER.

The workload of the reference's companion learning repo (reference
README.md:29-30 points spatial-coverage learning at katetolstaya/graph_rl),
entirely on device: greedy-expert (or beta-mixture) rollouts, padded obs
graphs, action-edge cross-entropy.

    python examples/train_coverage_gnn.py --cpu --iters 20
    python examples/train_coverage_gnn.py --dagger --iters 10
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
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import gym_flock_tpu as gft

    env, params = gft.make(args.env, n_graphs=args.graphs)
    key = jax.random.key(args.seed)

    if args.dagger:
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
