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


def clip_gradient_norms(max_norm: float) -> optax.GradientTransformation:
    """PER-VARIABLE norm clipping (reference: utils.py ::
    clip_gradient_norms applies tf.clip_by_norm to each gradient
    individually — NOT a global-norm clip)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

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
