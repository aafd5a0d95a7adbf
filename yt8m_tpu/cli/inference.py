"""inference CLI (reference: inference.py / inference-pre-ensemble.py)."""

from __future__ import annotations

import logging
import sys

from yt8m_tpu.config import InferenceConfig
from yt8m_tpu.infer.predict import inference
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
    cfg, _ = parse_into(InferenceConfig, argv, hparams_cls=ModelHParams)
    if not cfg.input_data_pattern:
        raise SystemExit("--input_data_pattern is required")
    if not cfg.output_file and not cfg.output_probabilities_dir:
        raise SystemExit(
            "--output_file or --output_probabilities_dir is required"
        )
    if not getattr(cfg, "ensemble_train_dirs", ""):
        # reference inference.py: rebuild the graph from the run's
        # recorded model_flags.json (explicit CLI flags win).
        apply_recorded_model_flags(cfg, argv)
    inference(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
