"""ensemble CLI (reference: fork ensemble scripts).

  python -m yt8m_tpu.cli.ensemble \
      --member_dirs=preds_a,preds_b --weights=1,2 \
      --output_file=ensemble.csv \
      [--eval_labels_pattern='validate-*.tfrecord' --fit_weights]
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

from yt8m_tpu.ensemble.average import (
    align_members,
    ensemble_directories,
    fit_weights_by_gap,
    labels_from_tfrecords,
    load_prediction_dir,
)
from yt8m_tpu.metrics import calculate_gap


def main(argv=None):
    # force=True: jax/absl already installed a root handler at import
    # time, which would silently swallow the reference log lines.
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--member_dirs", required=True,
                   help="comma-separated prediction dump dirs")
    p.add_argument("--weights", default="",
                   help="comma-separated member weights")
    p.add_argument("--output_file", default="")
    p.add_argument("--top_k", type=int, default=20)
    p.add_argument("--fit_weights", action="store_true")
    p.add_argument("--eval_labels_pattern", default="",
                   help="tfrecords with ground truth (weight fit / report)")
    p.add_argument("--frame_features", action="store_true")
    p.add_argument("--num_classes", type=int, default=4716)
    args = p.parse_args(argv)

    member_dirs = [d for d in args.member_dirs.split(",") if d]
    weights = (
        [float(w) for w in args.weights.split(",")] if args.weights else None
    )

    if args.fit_weights or args.eval_labels_pattern:
        ids, aligned = align_members(
            [load_prediction_dir(d) for d in member_dirs]
        )
        labels_by_id = labels_from_tfrecords(
            args.eval_labels_pattern, args.frame_features, args.num_classes
        )
        labels = np.stack([labels_by_id[v] for v in ids])
        if args.fit_weights:
            weights = fit_weights_by_gap(aligned, labels, args.top_k)
            logging.info("fitted weights: %s", weights)

    ids, avg = ensemble_directories(
        member_dirs, weights=weights, output_csv=args.output_file or None,
        top_k=args.top_k,
    )
    if args.eval_labels_pattern:
        labels_by_id = labels_from_tfrecords(
            args.eval_labels_pattern, args.frame_features, args.num_classes
        )
        labels = np.stack([labels_by_id[v] for v in ids])
        gap = calculate_gap(avg, labels, args.top_k)
        logging.info("ensemble GAP: %.5f", gap)
        print(f"GAP {gap:.5f}")


if __name__ == "__main__":
    main(sys.argv[1:])
