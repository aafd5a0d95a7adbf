"""train CLI (reference: train.py).

Example:
    python train.py --train_data_pattern='data/train-*.tfrecord' \
        --model=MoeModel --feature_names=mean_rgb,mean_audio \
        --feature_sizes=1024,128 --batch_size=1024 --train_dir=/tmp/m
"""

from __future__ import annotations

import logging
import sys

from yt8m_tpu.config import TrainConfig
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.loop import Trainer
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
    cfg, _ = parse_into(TrainConfig, argv, hparams_cls=ModelHParams)
    if not cfg.train_data_pattern:
        raise SystemExit("--train_data_pattern is required")
    Trainer(cfg).run()


if __name__ == "__main__":
    main(sys.argv[1:])
