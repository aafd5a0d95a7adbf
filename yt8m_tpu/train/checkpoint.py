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
        async_save: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state) -> bool:
        # Gate on should_save BEFORE device_get: pulling the full state to
        # host every step would serialise training on the transfer.
        if not self._mgr.should_save(step):
            return False
        if self.async_save:
            # --async_checkpoint: orbax's async path copies device
            # arrays to host BEFORE save() returns (the only blocking
            # portion); serialization + disk write continue on a
            # background thread. Donated train-state buffers are
            # therefore safe to reuse on the very next step, and the
            # train loop no longer stalls on the disk write. A save
            # issued while the previous one is in flight waits for it
            # inside orbax (ordering preserved); directories commit
            # atomically, so a crash mid-write leaves the previous
            # checkpoint as latest (resume falls back one save).
            return self._mgr.save(step, args=ocp.args.StandardSave(state))
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(self._host_copy(state))
        )
        self._mgr.wait_until_finished()
        return saved

    @staticmethod
    def _host_copy(state):
        """Host copy for the sync-save path — but FSDP/TP state in a
        multi-process run is NOT fully addressable (each process holds
        only its shards), and jax.device_get on such arrays raises.
        Orbax serializes sharded device arrays natively (each process
        writes its own shards), so pass them through untouched."""
        if jax.process_count() > 1:
            return state
        return jax.device_get(state)

    def force_save(self, step: int, state) -> bool:
        if step in self._mgr.all_steps():
            # A same-step async save may still be in flight (not yet in
            # all_steps) — handled below by the durability wait.
            self._mgr.wait_until_finished()
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(self._host_copy(state)),
            force=True,
        )
        # The final checkpoint of a run must be durable before run()
        # returns, async mode included.
        self._mgr.wait_until_finished()
        return saved

    def wait_until_finished(self) -> None:
        """Block until all in-flight async saves are committed."""
        self._mgr.wait_until_finished()

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
        # Durability before shutdown: drain any in-flight async save
        # (orbax's close also waits; explicit for the error path, where
        # close() is the only barrier between a raise and process exit).
        self._mgr.wait_until_finished()
        self._mgr.close()


def maybe_wipe_train_dir(train_dir: str, start_new_model: bool) -> None:
    """--start_new_model semantics (reference train.py removes the dir)."""
    if start_new_model and os.path.isdir(train_dir):
        shutil.rmtree(train_dir)
