#!/usr/bin/env python
"""Generate synthetic YT-8M-format TFRecords (video- and frame-level).

The repo ships no dataset (same as the reference); this produces
wire-format-identical shards with a planted label signal so the full
train/eval/inference/ensemble flow can be exercised end to end.

  python scripts/make_synthetic_data.py --out_dir=data \
      --frame_level=True --num_shards=4 --videos_per_shard=256
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from yt8m_tpu.data.synthetic import write_dataset  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="data")
    p.add_argument("--splits", default="train,validate,test")
    p.add_argument("--num_shards", type=int, default=2)
    p.add_argument("--videos_per_shard", type=int, default=128)
    p.add_argument("--frame_level", default="True")
    p.add_argument("--num_classes", type=int, default=4716)
    p.add_argument("--max_frames", type=int, default=300)
    args = p.parse_args(argv)
    frame_level = args.frame_level.lower() in ("true", "1", "yes")
    for i, split in enumerate(s for s in args.splits.split(",") if s):
        kw = dict(max_frames=args.max_frames) if frame_level else {}
        paths = write_dataset(
            args.out_dir,
            split,
            num_shards=args.num_shards,
            videos_per_shard=args.videos_per_shard,
            frame_level=frame_level,
            num_classes=args.num_classes,
            seed=i + 1,
            **kw,
        )
        print(f"{split}: wrote {len(paths)} shards to {args.out_dir}")


if __name__ == "__main__":
    main()
