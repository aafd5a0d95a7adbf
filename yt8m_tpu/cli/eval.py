"""eval CLI (reference: eval.py)."""

from __future__ import annotations

import logging
import sys

from yt8m_tpu.config import EvalConfig
from yt8m_tpu.eval.loop import evaluation_loop
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.utils.flags import parse_into


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
    evaluation_loop(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
