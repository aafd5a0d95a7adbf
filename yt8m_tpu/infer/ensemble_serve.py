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
class ServingState:
    """Weights-only serving state: a pytree (flax.struct) so the jitted
    predict/eval steps take it as a traced argument like a TrainState —
    but WITHOUT the optimizer state, so serving never spends HBM (or
    host->device transfer) on Adam moments (~2x the param bytes).

    Single model: params/batch_stats are the model's trees.
    Ensemble: tuples of per-member trees (EnsembleServe.apply order)."""

    params: Any
    batch_stats: Any


# Backwards-compatible name for the ensemble case.
EnsembleState = ServingState


class EnsembleServe:
    """Weighted-average meta-model over member models (serving only)."""

    def __init__(self, models: Sequence, weights: Sequence[float],
                 train_dirs: Sequence[str] = ()):
        if len(models) != len(weights):
            raise ValueError("one weight per member required")
        total = float(sum(weights))
        if total <= 0:
            raise ValueError("ensemble weights must sum to > 0")
        self.models = list(models)
        self.weights = [float(w) / total for w in weights]
        self.train_dirs = list(train_dirs)  # for restore_serving_state

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


def _member_run_config(train_dir: str):
    """Read a member run's model_flags.json (written by the trainer,
    reference train.py behavior). Returns (model_name | None,
    hparams_overrides dict) — empty when the file is absent (pre-r3
    runs), letting the caller fall back to the shared run config."""
    import json
    import os

    path = os.path.join(train_dir, "model_flags.json")
    if not os.path.exists(path):
        return None, {}
    with open(path) as f:
        data = json.load(f)
    return data.get("model"), data.get("hparams", {})


def build_ensemble(cfg) -> EnsembleServe:
    """EnsembleServe meta-model from --ensemble_train_dirs flags.

    HETEROGENEOUS members are supported (the fork's ensembles mixed
    model families by construction, SURVEY.md §3.5): each member is
    rebuilt from its own train_dir's model_flags.json — its own model
    class and hparams (e.g. a DBoF at cluster 8192 next to a NetVLAD at
    cluster 256). Explicit --ensemble_models entries override the
    recorded class; dirs without model_flags.json fall back to the
    shared run config. Weights come from --ensemble_weights (default
    uniform — fit them on validate GAP with cli/ensemble.py).

    Members must share the INPUT/OUTPUT contract — feature layout
    (feature_dim, max_frames) and vocab_size — since they consume one
    batch and average into one prediction tensor; that is validated
    here.
    """
    import dataclasses

    from yt8m_tpu.models import get_model

    dirs = [d for d in cfg.ensemble_train_dirs.split(",") if d]
    explicit_names = (
        [m for m in cfg.ensemble_models.split(",") if m]
        if cfg.ensemble_models
        else None
    )
    if explicit_names and len(explicit_names) != len(dirs):
        raise SystemExit(
            f"--ensemble_models has {len(explicit_names)} entries for "
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

    run_hp = cfg.resolved_hparams()
    hp_fields = {f.name for f in dataclasses.fields(run_hp)}
    # Serving-time/runtime knobs stay under the CLI's control: a member's
    # model_flags.json supplies only the STRUCTURAL hparams needed to
    # rebuild it (cluster sizes, layers, mixtures, ...). Without this
    # filter, recorded train-time values would silently override e.g.
    # --dbof_int8_serving or --compute_dtype passed at serve time.
    from yt8m_tpu.models.hparams import RUNTIME_HPARAM_FIELDS

    runtime_fields = RUNTIME_HPARAM_FIELDS
    models = []
    for i, d in enumerate(dirs):
        recorded_name, overrides = _member_run_config(d)
        name = (
            explicit_names[i]
            if explicit_names
            else (recorded_name or cfg.model)
        )
        hp = run_hp.replace(
            **{
                k: v for k, v in overrides.items()
                if k in hp_fields and k not in runtime_fields
            }
        )
        for field in ("feature_dim", "max_frames", "vocab_size"):
            if getattr(hp, field) != getattr(run_hp, field):
                raise SystemExit(
                    f"ensemble member {d}: {field}="
                    f"{getattr(hp, field)} does not match the run's "
                    f"{getattr(run_hp, field)} — members must share the "
                    "input/output contract"
                )
        models.append(get_model(name, hp))
    return EnsembleServe(models, weights, train_dirs=dirs)


def _restore_member(cfg, model, train_dir, sample_batch, step):
    """Restore one member's weights on HOST; returns (params, stats)."""
    from yt8m_tpu.train.checkpoint import CheckpointManager
    from yt8m_tpu.train.state import init_train_state, make_optimizer

    tx = make_optimizer(
        optimizer=cfg.optimizer,
        global_batch_size=cfg.batch_size,
        adam_mu_dtype=cfg.adam_mu_dtype,
    )
    state = init_train_state(
        model, jax.random.PRNGKey(0), sample_batch, tx,
        cfg.frame_features, ema=getattr(cfg, "use_ema_weights", False),
    )
    ckpt = CheckpointManager(train_dir)
    resolved = step if step is not None else ckpt.latest_step()
    state = ckpt.restore(state, resolved)
    ckpt.close()
    if getattr(cfg, "use_ema_weights", False):
        if state.ema_params is None:
            raise SystemExit(
                f"--use_ema_weights: {train_dir} has no EMA params "
                "(train with --ema_decay > 0)"
            )
        state = state.replace(params=state.ema_params)
    return state.params, state.batch_stats, resolved


def restore_serving_state(
    cfg, model, sample_batch, mesh, step=None
):
    """(ServingState on device, resolved step | None).

    The shared first-batch restore for eval/inference: handles both a
    single model and an EnsembleServe meta-model, selects EMA weights
    when asked, and device_puts ONLY params/batch_stats (replicated on
    the mesh) — optimizer state never leaves the host.
    """
    from yt8m_tpu.parallel import mesh as mesh_lib

    if isinstance(model, EnsembleServe):
        params, stats = [], []
        for member, train_dir in zip(model.models, model.train_dirs):
            p, s, _ = _restore_member(
                cfg, member, train_dir, sample_batch, step
            )
            params.append(p)
            stats.append(s)
        state = ServingState(
            params=tuple(params), batch_stats=tuple(stats)
        )
        resolved = None  # no single checkpoint step describes an ensemble
    else:
        p, s, resolved = _restore_member(
            cfg, model, cfg.train_dir, sample_batch, step
        )
        state = ServingState(params=p, batch_stats=s)
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(
            lambda _: mesh_lib.replicated(mesh), state
        ),
    )
    return state, resolved
