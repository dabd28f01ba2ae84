"""Train a flocking GNN by imitation — the end-to-end learning workload.

The reference generates expert data for an external learner repo
(README.md:28); here collection and training are one on-device program.

    python examples/train_flocking_gnn.py --cpu --iters 30        # BC
    python examples/train_flocking_gnn.py --cpu --dagger          # DAGGER
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agents", type=int, default=50)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--dagger", action="store_true")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import gym_flock_tpu as gft

    env, params = gft.make("FlockingRelative-v0", n_agents=args.agents)

    if args.dagger:
        from gym_flock_tpu.parallel import DaggerTrainer

        tr = DaggerTrainer(env, params)
        state, losses = tr.fit(
            jax.random.key(0), n_iters=args.iters,
            n_envs=args.envs, n_steps=args.steps,
        )
        model_params = state.params
        print(f"DAGGER: loss {losses[0]:.3f} -> {losses[-1]:.3f}")
        r = tr.evaluate(model_params, jax.random.key(1))
        print(f"closed-loop mean reward: {r:.2f}")
    else:
        from gym_flock_tpu.parallel import FlockingImitationTrainer

        tr = FlockingImitationTrainer(env, params)
        model_params, losses = tr.fit(
            jax.random.key(0), n_iters=args.iters,
            n_envs=args.envs, n_steps=args.steps,
        )
        print(f"BC: loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    if args.checkpoint:
        from gym_flock_tpu.parallel import save_checkpoint

        save_checkpoint(args.checkpoint, model_params, None)
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
