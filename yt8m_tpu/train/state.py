"""Train state + optimizer factory.

Reference train.py: AdamOptimizer, exponential LR decay staircased on
examples seen (`tf.train.exponential_decay(base_lr, global_step * batch,
learning_rate_decay_examples, learning_rate_decay, staircase=True)`),
`clip_gradient_norms` per-variable clip before apply.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + batch_stats (DBoF/NetVLAD use BatchNorm) +
    optional Polyak/EMA weight average (--ema_decay; SURVEY.md §5.4:
    the idiomatic train-time equivalent of checkpoint averaging)."""

    batch_stats: Any = flax.core.FrozenDict()
    # None = EMA off (no pytree leaves, so pre-EMA checkpoints restore
    # unchanged); a params-shaped tree when --ema_decay > 0.
    ema_params: Any = None


# Set (at trace time) by the MANUAL shard_map train step around its
# apply_gradients call: a params-shaped pytree of PartitionSpec telling
# clip_gradient_norms which mesh axes each gradient leaf is sharded
# over, so the per-VARIABLE norm is computed over the FULL variable
# (local sum-of-squares psum'd over the sharded axes) instead of the
# local shard. None (the default) = unsharded leaves, plain local norm
# — the single-program GSPMD path, where XLA handles cross-device norms
# itself. Trace-time plumbing only; see train/step.py :: grad_sharding.
_GRAD_PSPECS = None


class grad_sharding:
    """Context manager declaring gradient-leaf shardings for the
    per-variable clip (manual shard_map bodies only)."""

    def __init__(self, pspecs):
        self.pspecs = pspecs

    def __enter__(self):
        global _GRAD_PSPECS
        self._prev = _GRAD_PSPECS
        _GRAD_PSPECS = self.pspecs

    def __exit__(self, *exc):
        global _GRAD_PSPECS
        _GRAD_PSPECS = self._prev


def _leaf_sumsq(g, spec) -> jnp.ndarray:
    """Sum of squares of one (possibly sharded) gradient leaf, reduced
    over the mesh axes named in its PartitionSpec."""
    sumsq = jnp.sum(jnp.square(g.astype(jnp.float32)))
    if spec is not None:
        for axes in spec:
            if axes is None:
                continue
            for ax in axes if isinstance(axes, tuple) else (axes,):
                sumsq = jax.lax.psum(sumsq, ax)
    return sumsq


def clip_gradient_norms(max_norm: float) -> optax.GradientTransformation:
    """PER-VARIABLE norm clipping (reference: utils.py ::
    clip_gradient_norms applies tf.clip_by_norm to each gradient
    individually — NOT a global-norm clip)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(g, spec=None):
            norm = jnp.sqrt(_leaf_sumsq(g, spec))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        if _GRAD_PSPECS is not None:
            return (
                jax.tree_util.tree_map(clip_leaf, updates, _GRAD_PSPECS),
                state,
            )
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_lr_schedule(
    base_learning_rate: float,
    learning_rate_decay: float,
    learning_rate_decay_examples: int,
    global_batch_size: int,
) -> optax.Schedule:
    transition = max(learning_rate_decay_examples // global_batch_size, 1)
    return optax.exponential_decay(
        init_value=base_learning_rate,
        transition_steps=transition,
        decay_rate=learning_rate_decay,
        staircase=True,
    )


def make_optimizer(
    optimizer: str = "AdamOptimizer",
    base_learning_rate: float = 0.01,
    learning_rate_decay: float = 0.95,
    learning_rate_decay_examples: int = 4_000_000,
    global_batch_size: int = 1024,
    clip_gradient_norm: float = 1.0,
    adam_mu_dtype: str = "float32",
) -> optax.GradientTransformation:
    sched = make_lr_schedule(
        base_learning_rate,
        learning_rate_decay,
        learning_rate_decay_examples,
        global_batch_size,
    )
    opts = {
        # --adam_mu_dtype=bfloat16 stores Adam's first moment in bf16:
        # the VLAD-family train step is bound by optimizer HBM traffic
        # (BENCH_NOTES: 302M-param hidden FC), and mu's read+write is
        # 8 of the ~28 bytes/param of an Adam step.
        "AdamOptimizer": lambda: optax.adam(
            sched, eps=1e-8, mu_dtype=jnp.dtype(adam_mu_dtype)
        ),
        # TPU-native memory-lean option (beyond the reference's zoo):
        # factored second moments, O(rows+cols) state instead of O(n).
        "AdafactorOptimizer": lambda: optax.adafactor(
            learning_rate=sched
        ),
        "SgdOptimizer": lambda: optax.sgd(sched),
        "GradientDescentOptimizer": lambda: optax.sgd(sched),
        "RMSPropOptimizer": lambda: optax.rmsprop(sched),
        "AdagradOptimizer": lambda: optax.adagrad(sched),
    }
    if optimizer not in opts:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; available {sorted(opts)}"
        )
    tx = opts[optimizer]()
    if clip_gradient_norm > 0:
        tx = optax.chain(clip_gradient_norms(clip_gradient_norm), tx)
    return tx


def init_train_state(
    model,
    rng: jax.Array,
    sample_batch: dict,
    tx: optax.GradientTransformation,
    frame_level: bool,
    ema: bool = False,
) -> TrainState:
    """Initialise params/batch_stats from a (host, unsharded) sample batch.

    ema=True seeds ema_params with a copy of the initial params (the
    checkpoint tree must match between save and restore, so eval/infer
    pass --use_ema_weights to rebuild the same skeleton)."""
    feats = jnp.asarray(sample_batch["features"][:2])
    num_frames = jnp.asarray(sample_batch["num_frames"][:2])
    params_rng, sample_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "sample": sample_rng},
        feats,
        num_frames,
        train=False,
    )
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        batch_stats=variables.get("batch_stats", flax.core.FrozenDict()),
        ema_params=(
            jax.tree_util.tree_map(jnp.array, params) if ema else None
        ),
        tx=tx,
    )
