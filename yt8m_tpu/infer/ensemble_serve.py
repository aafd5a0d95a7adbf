"""On-device ensemble serving: N member checkpoints in ONE jitted step.

The fork's final submissions averaged member prediction FILES
(inference-pre-ensemble dumps -> host-side weighted average,
SURVEY.md §3.5) — supported here by ensemble/average.py. This module is
the TPU-native production-serving upgrade: every member's forward runs
in the same jit over the shared batch, the weighted average happens on
device, and only the ensemble's top-k crosses to the host. No dump
files, one pass over the input.

Integration is a meta-model: `EnsembleServe.apply` matches the flax
`model.apply` surface the predict steps use, and `EnsembleState` matches
the `.params` / `.batch_stats` surface, so the whole existing
inference() pipeline (on-device top-k, sparse/dense dumps, CSV, one-deep
host/device overlap) works unchanged.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EnsembleState:
    # A pytree (flax.struct) so the jitted predict steps take it as a
    # traced argument like a TrainState.
    params: Any       # tuple of member param trees
    batch_stats: Any  # tuple of member batch_stats (FrozenDicts)


class EnsembleServe:
    """Weighted-average meta-model over member models (serving only)."""

    def __init__(self, models: Sequence, weights: Sequence[float]):
        if len(models) != len(weights):
            raise ValueError("one weight per member required")
        total = float(sum(weights))
        if total <= 0:
            raise ValueError("ensemble weights must sum to > 0")
        self.models = list(models)
        self.weights = [float(w) / total for w in weights]

    def apply(self, variables, feats, num_frames, train: bool = False,
              teacher=None, rngs=None):
        del teacher
        if train:
            raise ValueError("EnsembleServe is inference-only")
        params = variables["params"]
        stats = variables.get("batch_stats") or (None,) * len(self.models)
        probs = None
        for model, p, bs, w in zip(
            self.models, params, stats, self.weights
        ):
            member_vars = {"params": p}
            if bs:
                member_vars["batch_stats"] = bs
            out = model.apply(
                member_vars, feats, num_frames, train=False, rngs=rngs
            )
            contrib = jnp.float32(w) * out["predictions"]
            probs = contrib if probs is None else probs + contrib
        return {"predictions": probs}


def build_ensemble(cfg) -> EnsembleServe:
    """EnsembleServe meta-model from --ensemble_train_dirs flags.

    Members share the run's feature config / hparams; per-member model
    classes come from --ensemble_models (default: --model for all),
    weights from --ensemble_weights (default: uniform — fit them on
    validate GAP with cli/ensemble.py if needed).
    """
    from yt8m_tpu.models import get_model

    dirs = [d for d in cfg.ensemble_train_dirs.split(",") if d]
    names = (
        [m for m in cfg.ensemble_models.split(",") if m]
        if cfg.ensemble_models
        else [cfg.model] * len(dirs)
    )
    if len(names) != len(dirs):
        raise SystemExit(
            f"--ensemble_models has {len(names)} entries for "
            f"{len(dirs)} --ensemble_train_dirs"
        )
    weights: List[float] = (
        [float(w) for w in cfg.ensemble_weights.split(",") if w]
        if cfg.ensemble_weights
        else [1.0] * len(dirs)
    )
    if len(weights) != len(dirs):
        raise SystemExit(
            f"--ensemble_weights has {len(weights)} entries for "
            f"{len(dirs)} --ensemble_train_dirs"
        )
    hp = cfg.resolved_hparams()
    ens = EnsembleServe([get_model(n, hp) for n in names], weights)
    ens.train_dirs = dirs
    return ens


def restore_ensemble_state(
    cfg, ensemble: EnsembleServe, sample_batch, mesh
) -> EnsembleState:
    """Restore every member's checkpoint into one EnsembleState."""
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.checkpoint import CheckpointManager
    from yt8m_tpu.train.state import init_train_state, make_optimizer

    params, stats = [], []
    for model, train_dir in zip(ensemble.models, ensemble.train_dirs):
        tx = make_optimizer(
            optimizer=cfg.optimizer,
            global_batch_size=cfg.batch_size,
            adam_mu_dtype=cfg.adam_mu_dtype,
        )
        state = init_train_state(
            model, jax.random.PRNGKey(0), sample_batch, tx,
            cfg.frame_features, ema=cfg.use_ema_weights,
        )
        ckpt = CheckpointManager(train_dir)
        state = ckpt.restore(state, cfg.checkpoint_step)
        ckpt.close()
        if cfg.use_ema_weights:
            if state.ema_params is None:
                raise SystemExit(
                    f"--use_ema_weights: {train_dir} has no EMA params"
                )
            state = state.replace(params=state.ema_params)
        state = jax.device_put(
            state,
            jax.tree_util.tree_map(
                lambda _: mesh_lib.replicated(mesh), state
            ),
        )
        params.append(state.params)
        stats.append(state.batch_stats)
    return EnsembleState(params=tuple(params), batch_stats=tuple(stats))
