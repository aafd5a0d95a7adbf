"""Checkpoint ensembling (fork capability [B/W], SURVEY.md §2.2/§5.4):
average predictions from several checkpoints of ONE training run, plus the
idiomatic-TPU alternative of averaging the WEIGHTS (polyak-style) into a
single cheap-to-serve model.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np

from yt8m_tpu.config import InferenceConfig
from yt8m_tpu.train.checkpoint import CheckpointManager


def ensemble_checkpoint_predictions(
    config: InferenceConfig,
    steps: Optional[Sequence[int]] = None,
    last_n: int = 3,
    output_dir: Optional[str] = None,
    output_csv: Optional[str] = None,
    weights: Optional[Sequence[float]] = None,
):
    """Run inference per checkpoint, dump dense probabilities, average.

    Reference flow (SURVEY.md §3.5): inference-pre-ensemble per checkpoint
    -> weighted average -> CSV.
    """
    from yt8m_tpu.ensemble.average import ensemble_directories
    from yt8m_tpu.infer.predict import inference

    ckpt = CheckpointManager(config.train_dir)
    all_steps = ckpt.all_steps()
    ckpt.close()
    if steps is None:
        steps = all_steps[-last_n:]
    if not steps:
        raise ValueError(f"no checkpoints in {config.train_dir}")

    output_dir = output_dir or os.path.join(
        config.train_dir, "ckpt_ensemble"
    )
    member_dirs = []
    for s in steps:
        member_dir = os.path.join(output_dir, f"step{s}")
        cfg = dataclasses.replace(
            config,
            checkpoint_step=s,
            output_file="",
            output_probabilities_dir=member_dir,
        )
        inference(cfg)
        member_dirs.append(member_dir)
    return ensemble_directories(
        member_dirs, weights=weights, output_csv=output_csv,
        top_k=config.top_k,
    )


def average_checkpoint_weights(
    train_dir: str, template_state, steps: Optional[Sequence[int]] = None,
    last_n: int = 3,
):
    """Polyak-style parameter averaging over checkpoints of one run.

    Returns template_state with params/batch_stats replaced by the mean —
    one serving-cost model instead of N inference passes.
    """
    ckpt = CheckpointManager(train_dir)
    all_steps = ckpt.all_steps()
    if steps is None:
        steps = all_steps[-last_n:]
    if not steps:
        ckpt.close()
        raise ValueError(f"no checkpoints in {train_dir}")

    acc = None
    for s in steps:
        state = ckpt.restore(template_state, s)
        leaves = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), leaves
            )
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), acc, leaves
            )
    ckpt.close()
    n = float(len(steps))
    mean = jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), acc
    )
    return template_state.replace(
        params=mean["params"], batch_stats=mean["batch_stats"]
    )
