#!/usr/bin/env python
"""Account for the 50k soak's +37.6 GB train-stage host RSS (r3 #6).

The soak's DBoF train stage (2 epochs x 55k videos, B=256) peaked
+37.6 GB host RSS while the dataset on disk is 9.94 GB and eval/infer
stream with ZERO growth. Candidate explanations:

  (a) axon-relay transfer retention: 2 epochs x 55k x 0.35 MB/video
      ~= 38.5 GB TOTAL host->device traffic — suspiciously equal to
      the growth. If the tunnel client (or the host buffer pool above
      it) retains a copy per transfer, RSS tracks cumulative traffic.
  (b) pipeline/parser retention: batches or mmap'd shard pages pinned
      by the reader chain.
  (c) JAX/XLA host steady state: compile artifacts + donated-buffer
      pool reaching a plateau.

This isolates (a) directly: a device_put loop over FRESH uint8 batches
(the exact soak batch shape) with /proc/self/smaps_rollup sampled as it
goes — anonymous vs file-backed RSS separates malloc'd copies from
mmap page-cache. Phase 2 reuses ONE pinned numpy buffer (distinguishes
per-transfer retention from per-object caching); phase 3 runs the real
data/pipeline.py reader chain host-only (isolates (b)).

A linear anonymous-RSS slope ~= bytes-transferred in phase 1 with flat
phases 2-3 pins the growth on the transfer path (the tunnel relay —
an environment artifact, not a framework leak; real v5e hosts DMA via
pinned staging buffers and do not accumulate).

Usage (chip):       python scripts/diagnose_train_rss.py
CPU control run:    YT8M_FORCE_CPU=1 python scripts/diagnose_train_rss.py
Env: YT8M_DIAG_ITERS (default 120), YT8M_DIAG_BATCH (default 256).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("YT8M_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

ITERS = int(os.environ.get("YT8M_DIAG_ITERS", "120"))
B = int(os.environ.get("YT8M_DIAG_BATCH", "256"))
F, D = 300, 1152
BATCH_MB = B * F * D / 1e6


def smaps() -> dict:
    out = {}
    with open("/proc/self/smaps_rollup") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[0].rstrip(":") in (
                "Rss",
                "Anonymous",
                "Shared_Clean",
                "Private_Clean",
                "Swap",
            ):
                out[parts[0].rstrip(":")] = int(parts[1]) / 1e6  # kB->GB
    return out


def report(tag, start, it, moved_gb):
    cur = smaps()
    print(
        json.dumps(
            {
                "phase": tag,
                "iter": it,
                "moved_gb": round(moved_gb, 2),
                "rss_gb": round(cur["Rss"], 2),
                "anon_growth_gb": round(
                    cur["Anonymous"] - start["Anonymous"], 2
                ),
                "file_growth_gb": round(
                    (cur["Rss"] - cur["Anonymous"])
                    - (start["Rss"] - start["Anonymous"]),
                    2,
                ),
            }
        ),
        flush=True,
    )
    return cur


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}, batch {BATCH_MB:.0f} MB x {ITERS}", flush=True)
    rng = np.random.default_rng(0)

    # Phase 1: fresh host buffers, like the pipeline's per-batch arrays.
    base = smaps()
    moved = 0.0
    for i in range(ITERS):
        arr = rng.integers(0, 256, size=(B, F, D), dtype=np.uint8)
        x = jax.device_put(arr, dev)
        x.block_until_ready()
        del x, arr
        moved += BATCH_MB / 1e3
        if (i + 1) % 20 == 0:
            report("fresh_buffers", base, i + 1, moved)
    end1 = report("fresh_buffers_final", base, ITERS, moved)

    # Phase 2: one reused host buffer — per-transfer vs per-object.
    arr = rng.integers(0, 256, size=(B, F, D), dtype=np.uint8)
    base2 = smaps()
    moved = 0.0
    for i in range(ITERS):
        x = jax.device_put(arr, dev)
        x.block_until_ready()
        del x
        moved += BATCH_MB / 1e3
        if (i + 1) % 40 == 0:
            report("reused_buffer", base2, i + 1, moved)
    report("reused_buffer_final", base2, ITERS, moved)

    # Phase 3: the real reader chain, host-only (no device transfers).
    import tempfile

    from yt8m_tpu.data.pipeline import make_batch_iterator
    from yt8m_tpu.data.readers import ReaderConfig
    from yt8m_tpu.data.synthetic import write_dataset

    with tempfile.TemporaryDirectory() as td:
        write_dataset(
            td,
            split="train",
            num_shards=4,
            videos_per_shard=500,
            frame_level=True,
            num_classes=64,
            seed=0,
        )
        cfg = ReaderConfig.frame_level(num_classes=64)
        base3 = smaps()
        n = 0
        for _epoch in range(3):
            it = make_batch_iterator(
                os.path.join(td, "train*.tfrecord"),
                cfg,
                B,
                num_readers=2,
            )
            for batch in it:
                n += int(batch["batch_mask"].sum())
        report("host_pipeline_3epochs", base3, n, n * 0.346 / 1e3)

    print(
        json.dumps(
            {
                "verdict_hint": {
                    "phase1_anon_slope_matches_traffic": bool(
                        end1["Anonymous"] - base["Anonymous"]
                        > 0.5 * ITERS * BATCH_MB / 1e3
                    ),
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
