"""eval CLI (reference: eval.py)."""

from __future__ import annotations

import logging
import sys

from yt8m_tpu.config import EvalConfig
from yt8m_tpu.eval.loop import evaluation_loop
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.utils.flags import apply_recorded_model_flags, parse_into


def main(argv=None):
    # force=True: jax/absl already installed a root handler at import
    # time, which would silently swallow the reference log lines.
    logging.basicConfig(
        level=logging.INFO,
        force=True,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    from yt8m_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    cfg, _ = parse_into(EvalConfig, argv, hparams_cls=ModelHParams)
    if not cfg.eval_data_pattern:
        raise SystemExit("--eval_data_pattern is required")
    if not cfg.ensemble_train_dirs:
        # reference eval.py: the run's recorded model_flags.json rebuilds
        # the graph — no re-typing of training flags. (Ensemble mode
        # rebuilds per member inside build_ensemble instead.)
        apply_recorded_model_flags(cfg, argv)
    evaluation_loop(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
