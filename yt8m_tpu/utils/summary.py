"""Scalar summaries (reference: TensorBoard summaries via utils.py ::
MakeSummary / AddGlobalStepSummary / AddEpochSummary; SURVEY.md §5.5).

Primary sink is a JSONL event log (dependency-free, machine-readable);
a TensorBoard event file is written too when TensorFlow is importable
(it is an oracle-only dependency, so this is best-effort and lazy).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


def _tb_default() -> bool:
    # TensorFlow import costs ~10 s and is oracle-only; opt in explicitly.
    import os

    return os.environ.get("YT8M_TENSORBOARD", "0") == "1"


class SummaryWriter:
    def __init__(self, logdir: str, tensorboard: bool = None):
        if tensorboard is None:
            tensorboard = _tb_default()
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(
            os.path.join(logdir, "events.jsonl"), "a", buffering=1
        )
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # lazy; oracle-only dependency

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    # Reference naming parity -------------------------------------------------

    def add_global_step_summary(
        self, step: int, summary_name_value: Dict[str, float]
    ) -> None:
        self.scalars(step, {f"GlobalStep/{k}": v
                            for k, v in summary_name_value.items()})

    def add_epoch_summary(
        self, step: int, summary_name_value: Dict[str, float]
    ) -> None:
        self.scalars(step, {f"Epoch/{k}": v
                            for k, v in summary_name_value.items()})

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
