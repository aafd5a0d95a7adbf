"""Checkpointing via orbax (reference: tf.train.Saver under Supervisor,
plus --start_new_model wipe; SURVEY.md §5.3/5.4).

Restart-idempotent: `restore_or_init` resumes from the latest step if the
train dir has one, mirroring Supervisor's auto-recovery.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 5,
        save_interval_steps: int = 1,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
                enable_async_checkpointing=False,
            ),
        )

    def save(self, step: int, state) -> bool:
        # Gate on should_save BEFORE device_get: pulling the full state to
        # host every step would serialise training on the transfer.
        if not self._mgr.should_save(step):
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(state))
        )
        self._mgr.wait_until_finished()
        return saved

    def force_save(self, step: int, state) -> bool:
        if step in self._mgr.all_steps():
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(state)), force=True
        )
        self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(
        self,
        state,
        step: Optional[int] = None,
        *,
        for_write: bool = False,
    ):
        """Restore into the structure of `state` (abstract or concrete).

        `for_write=True` marks a restore that resumes TRAINING in this
        manager's directory (the trainer), where dropping checkpoint-only
        EMA params is destructive once rotation deletes old steps — that
        case warns loudly. Read-only restores (eval/inference without
        --use_ema_weights) never rewrite the checkpoint, so they log at
        info instead.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
        except ValueError as e:
            # EMA presence may differ between the checkpoint and the
            # caller's skeleton (e.g. eval without --use_ema_weights of
            # an --ema_decay run, or resuming a pre-EMA checkpoint with
            # EMA newly enabled). Retry ONCE with the toggled-EMA
            # skeleton — structural, not keyed on orbax's error wording;
            # if the retry also fails, the original error propagates.
            if not hasattr(state, "ema_params"):
                raise
            if state.ema_params is None:
                retry = abstract.replace(
                    ema_params=jax.tree_util.tree_map(
                        ocp.utils.to_shape_dtype_struct, state.params
                    )
                )
            else:
                retry = abstract.replace(ema_params=None)
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(retry)
                )
            except Exception:
                raise e
            if state.ema_params is None:
                log = logging.getLogger("yt8m_tpu.checkpoint")
                if for_write:
                    # Training resume: rotation will delete the old
                    # checkpoints, so the Polyak average is genuinely
                    # about to be lost — warn.
                    log.warning(
                        "checkpoint step %s carries EMA params but the "
                        "resumed run was configured without them "
                        "(--ema_decay=0); the Polyak average is DROPPED "
                        "and will be lost from new checkpoints",
                        step,
                    )
                else:
                    # Read-only restore (eval/inference): nothing is
                    # rewritten; just note the raw weights were used.
                    log.info(
                        "checkpoint step %s carries EMA params; using "
                        "raw weights (pass --use_ema_weights to serve "
                        "the Polyak average)",
                        step,
                    )
            return restored.replace(ema_params=None)

    def close(self):
        self._mgr.close()


def maybe_wipe_train_dir(train_dir: str, start_new_model: bool) -> None:
    """--start_new_model semantics (reference train.py removes the dir)."""
    if start_new_model and os.path.isdir(train_dir):
        shutil.rmtree(train_dir)
