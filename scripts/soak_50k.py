#!/usr/bin/env python
"""Sustained-scale soak (r2 VERDICT #7): >=50k synthetic videos on disk
through the FULL pipeline on-chip — train -> poll-mode eval sweep ->
inference -> on-device ensemble — recording per-stage wall-clock and
peak RSS.

Components are all individually measured (BENCH_NOTES); this validates
the CHAIN at scale: steady-state streaming from disk, checkpoint sweep,
memory stability (no leak across ~1 hour-equivalent of step count), and
an honest end-to-end wall-clock.

Every stage runs as a subprocess through the REAL CLIs (train.py /
eval.py / inference.py), so flag parsing, auto-resume, model_flags.json
and the native reader all participate. Peak RSS per stage comes from
resource.getrusage(RUSAGE_CHILDREN) deltas (ru_maxrss is a high-water
mark: a stage that reports 0 delta peaked below a previous stage).

    python scripts/soak_50k.py [--videos 50000] [--out /tmp/yt8m_soak]

Prints one JSON line per stage plus a final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name, cmd, results, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    before = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    dt = time.time() - t0
    after = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        raise SystemExit(f"stage {name} failed rc={proc.returncode}")
    entry = {
        "stage": name,
        "wall_s": round(dt, 1),
        "child_peak_rss_mb": round(after / 1024, 1),
        "peak_rss_grew_mb": round((after - before) / 1024, 1),
    }
    results.append(entry)
    print(json.dumps(entry), flush=True)
    return proc.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=50_000)
    ap.add_argument("--out", default="/tmp/yt8m_soak")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    out = args.out
    data = os.path.join(out, "data")
    os.makedirs(data, exist_ok=True)
    results = []
    t_start = time.time()

    # ---- stage 0: >=50k frame-level videos on disk --------------------
    n_eval = (max(args.videos // 10, 2000) // 4) * 4
    shards = max(args.videos // 2000, 1)
    # Report what is actually written, not what was requested —
    # videos_per_shard floors, so n_train can fall short of --videos.
    n_train = (args.videos // shards) * shards
    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from yt8m_tpu.data.synthetic import write_dataset; "
        "write_dataset(%r, 'train', num_shards=%d, videos_per_shard=%d, "
        "frame_level=True, num_classes=4716, seed=1, rgb_dim=1024, "
        "audio_dim=128, max_frames=300); "
        "write_dataset(%r, 'validate', num_shards=4, videos_per_shard=%d, "
        "frame_level=True, num_classes=4716, seed=77, rgb_dim=1024, "
        "audio_dim=128, max_frames=300)"
        % (REPO, data, shards, n_train // shards, data, n_eval // 4)
    )
    run_stage(
        "generate_data", [sys.executable, "-c", gen], results,
        env_extra={"JAX_PLATFORMS": "cpu"},
    )
    disk_gb = sum(
        os.path.getsize(os.path.join(data, f)) for f in os.listdir(data)
    ) / 1e9
    print(json.dumps({"stage": "dataset", "videos": n_train + n_eval,
                      "disk_gb": round(disk_gb, 2)}), flush=True)

    common = [
        "--feature_names=rgb,audio", "--feature_sizes=1024,128",
        "--frame_features=True", "--num_classes=4716",
    ]

    # ---- stage 1+2: train two ensemble members on-chip ----------------
    # GatedDbofModel + GatedNetVladModel: different families (the r3
    # heterogeneous-ensemble contract), both mid-size production configs.
    members = [
        ("dbof", "GatedDbofModel",
         ["--dbof_cluster_size=2048", "--dbof_hidden_size=1024"]),
        ("netvlad", "GatedNetVladModel",
         ["--netvlad_cluster_size=128", "--netvlad_hidden_size=1024"]),
    ]
    for tag, model, extra in members:
        tdir = os.path.join(out, f"run_{tag}")
        run_stage(
            f"train_{tag}",
            [sys.executable, "train.py",
             f"--train_data_pattern={data}/train-*.tfrecord",
             f"--train_dir={tdir}", f"--model={model}",
             "--batch_size=256", "--num_epochs=2",
             "--base_learning_rate=0.001",
             "--save_checkpoint_every_n_steps=150",
             "--num_readers=2", "--log_every_n_steps=50"]
            + common + extra,
            results,
        )

    # ---- stage 3: poll-mode eval sweep over the netvlad checkpoints ---
    run_stage(
        "eval_sweep",
        [sys.executable, "eval.py",
         f"--eval_data_pattern={data}/validate-*.tfrecord",
         f"--train_dir={os.path.join(out, 'run_netvlad')}",
         "--model=GatedNetVladModel",
         "--netvlad_cluster_size=128", "--netvlad_hidden_size=1024",
         "--batch_size=512", "--run_once=False", "--max_evaluations=-1",
         "--num_readers=2"]
        + common,
        results,
    )

    # ---- stage 4: single-model inference -> Kaggle CSV ----------------
    run_stage(
        "inference_csv",
        [sys.executable, "inference.py",
         f"--input_data_pattern={data}/validate-*.tfrecord",
         f"--train_dir={os.path.join(out, 'run_netvlad')}",
         "--model=GatedNetVladModel",
         "--netvlad_cluster_size=128", "--netvlad_hidden_size=1024",
         "--batch_size=512", "--top_k=20", "--num_readers=2",
         f"--output_file={os.path.join(out, 'preds.csv')}"]
        + common,
        results,
    )

    # ---- stage 5: heterogeneous on-device ensemble --------------------
    # No --ensemble_models: member classes/hparams come from each run's
    # model_flags.json (r3).
    run_stage(
        "ensemble_device",
        [sys.executable, "inference.py",
         f"--input_data_pattern={data}/validate-*.tfrecord",
         "--ensemble_train_dirs="
         + ",".join(os.path.join(out, f"run_{t}") for t, _, _ in members),
         "--batch_size=512", "--top_k=20", "--num_readers=2",
         f"--output_file={os.path.join(out, 'ensemble_preds.csv')}"]
        + common,
        results,
    )

    # ---- summary -------------------------------------------------------
    n_lines = sum(1 for _ in open(os.path.join(out, "ensemble_preds.csv")))
    summary = {
        "stage": "SUMMARY",
        "total_wall_min": round((time.time() - t_start) / 60, 1),
        "train_videos": n_train,
        "eval_videos": n_eval,
        "disk_gb": round(disk_gb, 2),
        "ensemble_csv_rows": n_lines - 1,
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024, 1
        ),
        "stages": results,
    }
    print(json.dumps(summary), flush=True)
    if not args.keep:
        shutil.rmtree(data, ignore_errors=True)


if __name__ == "__main__":
    main()
