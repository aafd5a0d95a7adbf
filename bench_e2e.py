#!/usr/bin/env python
"""End-to-end inference benchmark: DISK -> parser -> device -> top-20 CSV.

The headline bench.py measures the device serving step with batches
generated on device (justified under the axon tunnel — see BENCH_NOTES
"Methodology"). This measures the real chain the reference's
inference.py runs: TFRecord shards on disk, host-side parsing
(--num_readers threads), host->device transfer, jitted forward +
top-20, CSV formatting — reporting honest disk-to-CSV videos/sec.

Usage:
    python bench_e2e.py [--videos 2048] [--num_readers 1] [--batch_size 512]
                        [--model DbofModel] [--keep_data]

Prints one JSON line. Synthetic shards (~345 KB/video: uint8
[300, 1152] + labels) are cached under .bench_data/ across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=2048)
    ap.add_argument("--num_shards", type=int, default=4)
    ap.add_argument("--num_readers", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--model", default="DbofModel")
    ap.add_argument("--data_dir", default="")
    ap.add_argument(
        "--parse_only", action="store_true",
        help="measure disk->parsed-batches only (host half; no device). "
        "Useful under the axon tunnel, where host->device transfers ride "
        "a network relay and the full e2e number measures the tunnel.",
    )
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yt8m_tpu.config import InferenceConfig
    from yt8m_tpu.data.synthetic import write_dataset
    from yt8m_tpu.infer.predict import inference

    data_dir = args.data_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_data",
        f"e2e_{args.videos}",
    )
    marker = os.path.join(data_dir, ".complete")
    if not os.path.exists(marker):
        print(
            f"# writing {args.videos} synthetic videos to {data_dir} ...",
            file=sys.stderr,
        )
        write_dataset(
            data_dir, "test",
            num_shards=args.num_shards,
            videos_per_shard=args.videos // args.num_shards,
            frame_level=True, num_classes=4716, seed=17,
            rgb_dim=1024, audio_dim=128, max_frames=300, min_frames=30,
        )
        open(marker, "w").close()

    if args.parse_only:
        from yt8m_tpu.data.pipeline import make_batch_iterator
        from yt8m_tpu.data.readers import ReaderConfig

        rc = ReaderConfig(
            feature_names="rgb,audio", feature_sizes="1024,128",
            frame_features=True, num_classes=4716, max_frames=300,
        )

        def run_epoch():
            n = 0
            for b in make_batch_iterator(
                os.path.join(data_dir, "test-*.tfrecord"), rc,
                batch_size=args.batch_size,
                num_readers=args.num_readers,
                shuffle=False, num_epochs=1, pad_final_batch=True,
            ):
                n += int(b["batch_mask"].sum())
            return n

        run_epoch()  # warm the page cache
        t0 = time.perf_counter()
        n = run_epoch()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "host_parse_videos_per_sec",
                    "value": round(n / dt, 1),
                    "unit": "videos/sec",
                    "num_videos": n,
                    "num_readers": args.num_readers,
                }
            )
        )
        return

    out_csv = os.path.join(data_dir, "bench_out.csv")
    cfg = InferenceConfig(
        input_data_pattern=os.path.join(data_dir, "test-*.tfrecord"),
        feature_names="rgb,audio",
        feature_sizes="1024,128",
        frame_features=True,
        num_classes=4716,
        max_frames=300,
        batch_size=args.batch_size,
        model=args.model,
        num_readers=args.num_readers,
        output_file=out_csv,
        hparams=_flagship_hp(),
    )

    # Random-init state (no checkpoint): e2e throughput is
    # model-weights-agnostic; inference() builds state when train_dir has
    # no checkpoint only via restore, so init one explicitly.
    state = _init_state(cfg)

    # Warm-up epoch (compiles the forward; parser caches nothing).
    inference(
        _replace(cfg, output_file=out_csv + ".warmup"), state=state
    )

    t0 = time.perf_counter()
    stats = inference(cfg, state=state)
    dt = time.perf_counter() - t0
    vps = stats["num_videos"] / dt

    print(
        json.dumps(
            {
                "metric": "e2e_disk_to_csv_videos_per_sec",
                "value": round(vps, 1),
                "unit": "videos/sec",
                "num_videos": stats["num_videos"],
                "num_readers": args.num_readers,
                "batch_size": args.batch_size,
                "model": args.model,
            }
        )
    )


def _flagship_hp():
    from __graft_entry__ import _flagship_hparams

    return _flagship_hparams()


def _replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def _init_state(cfg):
    import jax
    import numpy as np

    from yt8m_tpu.models import get_model
    from yt8m_tpu.train.state import init_train_state, make_optimizer

    hp = cfg.resolved_hparams()
    model = get_model(cfg.model, hp)
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.integers(
            0, 256, size=(2, hp.max_frames, hp.feature_dim), dtype=np.uint8
        ),
        "labels": np.zeros((2, hp.vocab_size), np.float32),
        "num_frames": np.full((2,), hp.max_frames, np.int32),
        "batch_mask": np.ones((2,), np.float32),
    }
    tx = make_optimizer(global_batch_size=cfg.batch_size)
    return init_train_state(
        model, jax.random.PRNGKey(0), batch, tx, cfg.frame_features
    )


if __name__ == "__main__":
    sys.exit(main())
