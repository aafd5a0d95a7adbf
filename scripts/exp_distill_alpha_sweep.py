#!/usr/bin/env python
"""--distill_alpha sweep (VERDICT r4 next #1, contingency branch).

The r5 soak (scripts/soak_distill_boost.py) measured the distilled
DBoF student at alpha=0.5 BELOW its CE-only control (0.94552 vs
0.95233) on the synthetic proxy. That is the expected direction on
clean planted labels — distillation's value (label denoising, dark
knowledge) needs noisy/incomplete labels to have something to add,
and alpha=0.5 halves the weight on labels that are already perfect.
Per the verdict, this records the tuning sweep: students at
additional alphas on the SAME teacher-annotated records (alpha=1.0
== the CE control by construction, losses.py
:: MixedCrossEntropyDistillLoss), same flags/seed as the soak.

Usage: python scripts/exp_distill_alpha_sweep.py \
         [--data /tmp/distill_sweep] [--alphas 0.75,0.9,0.25]
Results: one JSON line per alpha + summary; per-alpha JSON persisted
to --out so a dead session costs one arm.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, log_name, out_dir):
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    with open(os.path.join(out_dir, log_name), "w") as f:
        f.write(proc.stdout)
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        raise SystemExit(f"{log_name} failed rc={proc.returncode}")
    return proc.stdout, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data", default="/tmp/yt8m_distill_soak",
        help="a soak_distill_boost.py --keep out-dir: needs "
        "distill_data/train-*.tfrecord and data/validate-*.tfrecord",
    )
    ap.add_argument("--out", default="/tmp/distill_alpha_sweep")
    ap.add_argument("--alphas", default="0.75,0.9,0.25")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    common = [
        "--feature_names=rgb,audio", "--feature_sizes=1024,128",
        "--frame_features=True", "--num_classes=4716",
        "--num_readers=2", "--batch_size=256",
        "--model=DbofModel",
        "--dbof_cluster_size=2048", "--dbof_hidden_size=1024",
    ]
    epochs = [f"--num_epochs={args.epochs}",
              "--base_learning_rate=0.001",
              "--log_every_n_steps=50"]

    rows = []
    for alpha in [float(a) for a in args.alphas.split(",")]:
        tag = f"alpha{alpha:g}".replace(".", "p")
        path = os.path.join(args.out, f"{tag}.json")
        if os.path.exists(path):
            rows.append(json.load(open(path)))
            print(f"skip {tag} (exists)", flush=True)
            continue
        tdir = os.path.join(args.out, tag)
        _, dt_train = run(
            [sys.executable, "train.py",
             f"--train_data_pattern={args.data}/distill_data/"
             "train-*.tfrecord",
             "--distill_data_pattern=teacher",
             "--label_loss=MixedCrossEntropyDistillLoss",
             f"--distill_alpha={alpha}",
             f"--train_dir={tdir}"] + common + epochs,
            f"train_{tag}.log", args.out,
        )
        out, dt_eval = run(
            [sys.executable, "eval.py",
             f"--eval_data_pattern={args.data}/data/validate-*.tfrecord",
             f"--train_dir={tdir}", "--run_once=True",
             "--batch_size=512"]
            + [f for f in common if not f.startswith("--batch_size")],
            f"eval_{tag}.log", args.out,
        )
        gaps = re.findall(r"GAP: ([0-9.]+)", out)
        row = {
            "alpha": alpha,
            "gap": float(gaps[-1]),
            "train_s": round(dt_train, 1),
            "eval_s": round(dt_eval, 1),
        }
        with open(path, "w") as f:
            json.dump(row, f)
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: r["alpha"])
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
