"""Coverage imitation trainer: EdgeGraphNet policy cloned from the expert.

The coverage analog of ``train.py``'s flocking trainer — and the workload of
the reference's companion learning repo (reference README.md:29-30 points
spatial-coverage learning at katetolstaya/graph_rl).  On-device pipeline:

    greedy-expert rollouts (vmapped envs) -> (padded obs graphs, labels)
    -> EdgeGraphNet message passing -> per-robot action logits
    -> cross-entropy to the expert action -> optax update

Action logits come straight from the observation's edge structure: the
buffer tail's first ``R*A`` entries are exactly robot ``i``'s ``A`` motion
candidates in action order (node->robot edges, see
``CoverageEnv._obs_reward``), so a policy that scores edges yields the
[R, A] action distribution by a static gather — no extra decoding.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams
from gym_flock_tpu.models.gnn import EdgeGraphNet

__all__ = [
    "CoverageImitationTrainer",
    "CoverageDaggerTrainer",
    "collect_coverage_batch",
    "action_edge_logits",
]


def action_edge_logits(edge_logits: jax.Array, params: CoverageParams) -> jax.Array:
    """Gather per-robot action logits [R, A] from per-edge logits [E, 1].

    Robot i's candidates sit at tail offset ``E - n_tail + i*A + a``
    (the node->robot half of the bidirectional action edges).
    """
    E = params.max_edges
    R, A = params.n_robots, params.n_actions
    n_tail = params.n_action_edges + params.n_comm_edges
    start = E - n_tail
    idx = start + jnp.arange(R * A)
    return edge_logits[idx, 0].reshape(R, A)


def collect_coverage_batch(
    env: CoverageEnv, params: CoverageParams, key: jax.Array, n_envs: int, n_steps: int
):
    """Greedy-expert rollouts keeping (obs graph, expert action) pairs.

    Returns a dict of arrays with leading axis [n_envs * n_steps].
    """

    def one(key):
        k_reset, k_scan = jax.random.split(key)
        state, obs = env.reset_env(k_reset, params)

        def body(carry, key_t):
            state, obs = carry
            k1, k2 = jax.random.split(key_t)
            u = env.controller(state, params, key=k1, greedy=True)
            state2, obs2, r, d, _ = env.step_env(k2, state, u, params)
            sample = {
                "nodes": obs["nodes"],
                "edges": obs["edges"],
                "senders": obs["senders"],
                "receivers": obs["receivers"],
                "label": u.reshape(-1),
            }
            return (state2, obs2), sample

        _, traj = jax.lax.scan(body, (state, obs), jax.random.split(k_scan, n_steps))
        return traj

    keys = jax.random.split(key, n_envs)
    traj = jax.vmap(one)(keys)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)


class CoverageImitationTrainer:
    """Behavior cloning of the greedy coverage expert into an EdgeGraphNet."""

    def __init__(
        self,
        env: CoverageEnv,
        env_params: CoverageParams,
        model: Optional[EdgeGraphNet] = None,
        learning_rate: float = 1e-3,
    ):
        self.env = env
        self.env_params = env_params
        self.model = model or EdgeGraphNet(latent=32, rounds=2)
        self.tx = optax.adam(learning_rate)

    def _graph(self, sample):
        senders = sample["senders"]
        mask = senders != -1
        return {
            "nodes": sample["nodes"],
            "edges": sample["edges"],
            "senders": jnp.where(mask, senders, 0),
            "receivers": jnp.where(mask, sample["receivers"], 0),
            "edge_mask": mask,
        }

    def init(self, key: jax.Array):
        p = self.env_params
        dummy = {
            "nodes": jnp.zeros((p.max_nodes, p.n_node_feat)),
            "edges": jnp.zeros((p.max_edges, p.n_edge_feat)),
            "senders": jnp.zeros((p.max_edges,), jnp.int32),
            "receivers": jnp.zeros((p.max_edges,), jnp.int32),
            "edge_mask": jnp.zeros((p.max_edges,), bool),
        }
        params = self.model.init(key, dummy)
        return params, self.tx.init(params)

    def loss_fn(self, params, batch):
        def one(sample):
            g = self._graph(sample)
            _, edge_logits = self.model.apply(params, g)
            logits = action_edge_logits(edge_logits, self.env_params)  # [R, A]
            labels = sample["label"]  # [R]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )

        return jnp.mean(jax.vmap(one)(batch))

    def accuracy(self, params, batch):
        def one(sample):
            g = self._graph(sample)
            _, edge_logits = self.model.apply(params, g)
            logits = action_edge_logits(edge_logits, self.env_params)
            return jnp.mean(
                (jnp.argmax(logits, axis=1) == sample["label"]).astype(jnp.float32)
            )

        return jnp.mean(jax.vmap(one)(batch))

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def train_step(self, carry, key, n_envs: int = 4, n_steps: int = 8):
        batch = collect_coverage_batch(self.env, self.env_params, key, n_envs, n_steps)
        return self._update(carry, batch)

    @partial(jax.jit, static_argnums=0)
    def update_from_batch(self, carry, batch):
        """One optimizer step on an EXTERNALLY collected batch — e.g. the
        host-parallel VRP-labeled batches of ``parallel.vrp_labels``
        (same dict layout as ``collect_coverage_batch``)."""
        return self._update(carry, batch)

    def _update(self, carry, batch):
        # the single grad/update body both entry points share
        params, opt_state = carry
        loss, grads = jax.value_and_grad(self.loss_fn)(params, batch)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def fit(
        self,
        key: jax.Array,
        n_iters: int = 20,
        n_envs: int = 4,
        n_steps: int = 8,
        eval_params: Optional[CoverageParams] = None,
        eval_every: int = 0,
        ckpt_path: Optional[str] = None,
        ckpt_every: int = 0,
        resume: bool = True,
    ):
        """Train; optionally report generalization metrics on a held-out
        graph bank every ``eval_every`` iterations (ROADMAP: multi-graph
        training must be validated on graphs never sampled in training).

        ``ckpt_path``/``ckpt_every``/``resume``: checkpoint (params, opt
        state, iteration, RNG key) periodically and continue an interrupted
        run with the exact RNG stream of an uninterrupted one (see
        ``FlockingImitationTrainer.fit``)."""
        import os

        from gym_flock_tpu.parallel.train import restore_checkpoint, save_checkpoint

        k_init, key = jax.random.split(key)
        carry = self.init(k_init)
        start = 0
        if ckpt_path and resume and os.path.exists(ckpt_path):
            p, o, start, saved_key = restore_checkpoint(ckpt_path, *carry)
            carry = (p, o)
            key = saved_key if saved_key is not None else key
        losses, evals = [], []
        for it in range(start, n_iters):
            key, sub = jax.random.split(key)
            carry, loss = self.train_step(carry, sub, n_envs, n_steps)
            losses.append(float(loss))
            done = it + 1 == n_iters
            if ckpt_path and (done or (ckpt_every and (it + 1) % ckpt_every == 0)):
                save_checkpoint(ckpt_path, carry[0], carry[1], step=it + 1, key=key)
            if eval_every and eval_params is not None and (it + 1) % eval_every == 0:
                key, sub = jax.random.split(key)
                evals.append(
                    {"iter": it + 1, **self.evaluate(carry[0], sub, eval_params)}
                )
        if eval_params is not None and eval_every:
            return carry, losses, evals
        return carry, losses

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _eval_metrics(self, params, key, env_params, n_envs: int, n_steps: int):
        """Jitted core of :meth:`evaluate`: expert-label accuracy on a batch
        from ``env_params``'s bank, plus learned-policy vs expert episode
        reward over matched resets."""
        k_batch, k_roll = jax.random.split(key)
        batch = collect_coverage_batch(self.env, env_params, k_batch, n_envs, n_steps)

        def acc_one(sample):
            g = self._graph(sample)
            _, edge_logits = self.model.apply(params, g)
            logits = action_edge_logits(edge_logits, env_params)
            return jnp.mean(
                (jnp.argmax(logits, axis=1) == sample["label"]).astype(jnp.float32)
            )

        acc = jnp.mean(jax.vmap(acc_one)(batch))

        def rollout(key, use_policy):
            k_reset, k_steps = jax.random.split(key)
            state, obs = self.env.reset_env(k_reset, env_params)

            def body(carry, key_t):
                state, obs = carry
                if use_policy:
                    g = self._graph(obs)
                    _, edge_logits = self.model.apply(params, g)
                    logits = action_edge_logits(edge_logits, env_params)
                    action = jnp.argmax(logits, axis=1)
                else:
                    action = self.env.controller(state, env_params)
                # fresh key per step: reusing the rollout key made per-step
                # env randomness (e.g. revisit_nodes flips) identical at
                # every timestep
                state, obs, r, _, _ = self.env.step_env(
                    key_t, state, action, env_params
                )
                return (state, obs), r

            _, rs = jax.lax.scan(
                body, (state, obs), jax.random.split(k_steps, n_steps)
            )
            return jnp.sum(rs)

        keys = jax.random.split(k_roll, n_envs)
        policy_reward = jnp.mean(jax.vmap(lambda k: rollout(k, True))(keys))
        expert_reward = jnp.mean(jax.vmap(lambda k: rollout(k, False))(keys))
        return acc, policy_reward, expert_reward

    def evaluate(
        self,
        params,
        key: jax.Array,
        env_params: Optional[CoverageParams] = None,
        n_envs: int = 4,
        n_steps: int = 8,
    ):
        """Generalization report on a (held-out) bank: expert-action
        accuracy, mean episode reward of the learned greedy policy and of
        the expert over the SAME resets, and their ratio."""
        p = env_params if env_params is not None else self.env_params
        acc, pol, exp = self._eval_metrics(params, key, p, n_envs, n_steps)
        exp_f = float(exp)
        return {
            "accuracy": float(acc),
            "policy_reward": float(pol),
            "expert_reward": exp_f,
            "reward_ratio": float(pol) / exp_f if exp_f != 0 else float("nan"),
        }


def make_sharded_train_step(trainer: CoverageImitationTrainer, mesh=None,
                            n_envs: int = 16, n_steps: int = 8):
    """Data-parallel coverage BC step (delegates to the shared DP layout in
    ``gym_flock_tpu.parallel.train.make_dp_train_step``)."""
    from gym_flock_tpu.parallel.rollout import make_env_mesh
    from gym_flock_tpu.parallel.train import make_dp_train_step

    if mesh is None:
        mesh = make_env_mesh("dp")
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    local_envs = n_envs // n_dev

    def local_loss(params, key):
        batch = collect_coverage_batch(
            trainer.env, trainer.env_params, key, local_envs, n_steps
        )
        return trainer.loss_fn(params, batch)

    return make_dp_train_step(trainer.tx, local_loss, mesh=mesh)


class CoverageDaggerTrainer:
    """DAGGER for the coverage policy — dataset aggregation on device.

    The coverage analog of :class:`gym_flock_tpu.parallel.dagger.DaggerTrainer`
    (the reference ships no trainer; its companion learning repo,
    reference README.md:29-30, aggregates expert-labeled datasets the same
    way).  Per iteration, one jitted program:

    * mixture rollouts: a per-step Bernoulli(beta) coin picks the greedy
      expert's action or the learner's argmax over its action-edge logits,
      so the learner's own state distribution enters the dataset;
    * every visited padded obs graph is labeled with the EXPERT action and
      written into a rolling fixed-capacity buffer;
    * minibatch cross-entropy steps on the aggregate.
    """

    def __init__(
        self,
        env: CoverageEnv,
        env_params: CoverageParams,
        model: Optional[EdgeGraphNet] = None,
        learning_rate: float = 1e-3,
        capacity: int = 1024,
        beta_decay: float = 0.7,
    ):
        self.inner = CoverageImitationTrainer(env, env_params, model, learning_rate)
        self.env = env
        self.env_params = env_params
        self.model = self.inner.model
        self.tx = self.inner.tx
        self.capacity = capacity
        self.beta_decay = beta_decay

    def init(self, key: jax.Array):
        p = self.env_params
        params, opt_state = self.inner.init(key)
        cap = self.capacity
        buf = {
            "nodes": jnp.zeros((cap, p.max_nodes, p.n_node_feat)),
            "edges": jnp.zeros((cap, p.max_edges, p.n_edge_feat)),
            "senders": jnp.full((cap, p.max_edges), -1, jnp.int32),
            "receivers": jnp.full((cap, p.max_edges), -1, jnp.int32),
            "label": jnp.zeros((cap, p.n_robots), jnp.int32),
        }
        return {
            "params": params,
            "opt_state": opt_state,
            "buffer": buf,
            "write_pos": jnp.int32(0),
            "filled": jnp.int32(0),
        }

    @partial(
        jax.jit,
        static_argnums=(0,),
        static_argnames=("n_envs", "n_steps", "n_grad_steps", "batch_size"),
    )
    def iteration(
        self,
        state,
        key: jax.Array,
        beta,
        n_envs: int = 8,
        n_steps: int = 16,
        n_grad_steps: int = 4,
        batch_size: int = 128,
    ):
        env, p = self.env, self.env_params
        k_collect, k_train = jax.random.split(key)
        params_now = state["params"]

        def one_env(key):
            k_reset, k_scan = jax.random.split(key)
            s, obs = env.reset_env(k_reset, p)

            def body(carry, key_t):
                s, obs = carry
                k_coin, k_exp, k_step = jax.random.split(key_t, 3)
                u_exp = env.controller(s, p, key=k_exp, greedy=True).reshape(-1)
                g = self.inner._graph(obs)
                _, edge_logits = self.model.apply(params_now, g)
                logits = action_edge_logits(edge_logits, p)
                u_learn = jnp.argmax(logits, axis=1).astype(u_exp.dtype)
                use_expert = jax.random.bernoulli(k_coin, beta)
                u = jnp.where(use_expert, u_exp, u_learn)
                s2, obs2, _, _, _ = env.step_env(k_step, s, u, p)
                sample = {
                    "nodes": obs["nodes"],
                    "edges": obs["edges"],
                    "senders": obs["senders"],
                    "receivers": obs["receivers"],
                    "label": u_exp.astype(jnp.int32),
                }
                return (s2, obs2), sample

            _, traj = jax.lax.scan(body, (s, obs), jax.random.split(k_scan, n_steps))
            return traj

        traj = jax.vmap(one_env)(jax.random.split(k_collect, n_envs))
        traj = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)

        n_new = n_envs * n_steps
        cap = self.capacity
        # a single scatter with duplicate indices would pair one sample's
        # graph with another's label (per-key winners are undefined)
        assert n_new <= cap, (
            f"n_envs*n_steps={n_new} exceeds buffer capacity={cap}; "
            f"raise capacity or collect less per iteration"
        )
        idx = (state["write_pos"] + jnp.arange(n_new)) % cap
        buf = {
            k: state["buffer"][k].at[idx].set(
                traj[k].astype(state["buffer"][k].dtype)
            )
            for k in state["buffer"]
        }
        write_pos = (state["write_pos"] + n_new) % cap
        filled = jnp.minimum(state["filled"] + n_new, cap)

        def grad_step(carry, key_b):
            params, opt_state = carry
            bi = jax.random.randint(key_b, (min(batch_size, cap),), 0, filled)
            batch = {k: v[bi] for k, v in buf.items()}
            loss, grads = jax.value_and_grad(self.inner.loss_fn)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            grad_step,
            (state["params"], state["opt_state"]),
            jax.random.split(k_train, n_grad_steps),
        )
        state = {
            "params": params,
            "opt_state": opt_state,
            "buffer": buf,
            "write_pos": write_pos,
            "filled": filled,
        }
        return state, jnp.mean(losses)

    def fit(self, key: jax.Array, n_iters: int = 10, **kwargs):
        """beta_k = beta_decay^k schedule (beta_0 = 1: pure expert)."""
        k_init, key = jax.random.split(key)
        state = self.init(k_init)
        losses = []
        for k in range(n_iters):
            key, sub = jax.random.split(key)
            beta = jnp.asarray(self.beta_decay**k)
            state, loss = self.iteration(state, sub, beta, **kwargs)
            losses.append(float(loss))
        return state, losses
