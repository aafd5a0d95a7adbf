#!/usr/bin/env python
"""At-scale soak of the distillation and boosting pipelines (r3 #6).

The 50k soak (scripts/soak_50k.py) covered train/eval/infer/ensemble;
distill_pipeline.sh and boosted_pipeline.sh had only unit/CLI tests.
This runs one on-chip chain of EACH through the REAL CLIs at a scale
that exercises the teacher-ingestion reader and the weighted-loss path
for multiple epochs:

  distillation: teacher (GatedNetVlad) train -> eval -> dense dump on
    the TRAIN split -> teacher predictions written back into the
    records (write_distill_dataset, top-64 sparsified) -> student
    (DBoF) trains the mixed loss -> eval, vs a CE-only student control
    with identical flags/seed. The number that matters: does the
    distilled student beat the CE-only student's GAP?

  boosting: member1 = the CE-only student (reused) -> member1's
    train-split errors -> fit_boost_weights -> member2 trains with
    --boost_weights_file (hard videos upweighted) -> both members dump
    validate probabilities -> GAP-weight-fit ensemble. The number:
    ensemble GAP vs best single member.

Per-stage wall-clock + child peak RSS recorded like soak_50k.py.

    python scripts/soak_distill_boost.py [--videos 20000] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
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


def last_gap(stdout: str) -> float:
    gaps = re.findall(r"GAP: ([0-9.]+)", stdout)
    if not gaps:
        raise SystemExit("no GAP in eval output")
    return float(gaps[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=20_000)
    ap.add_argument("--out", default="/tmp/yt8m_distill_soak")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--label_dropout", type=float, default=0.0,
        help="TRAIN-split incomplete-label rate: each true positive is "
        "missing from the written records with this prob (validate stays "
        "clean). The r5 clean-label run measured the distilled student "
        "BELOW its CE control (0.94552 vs 0.95233) — expected, alpha=0.5 "
        "halves the weight on already-perfect labels. This flag creates "
        "the incomplete-label regime YT-8M actually has and distillation "
        "exists for. MEASURED at dropout=0.3 (r5 second run): distilled "
        "0.86801 vs CE control 0.89735 — still a loss, because the "
        "synthetic feature->label map is deterministic so the CE control "
        "recovers dropped positives from features alone, and the "
        "same-capability teacher (GAP 0.89518) adds no information. "
        "Distillation pays when the teacher is STRONGER and the label "
        "noise irreducible (real YT-8M) — see BENCH_NOTES 'Distill/boost "
        "at-scale soak' for the full mechanism read.",
    )
    args = ap.parse_args()

    out = args.out
    data = os.path.join(out, "data")
    os.makedirs(data, exist_ok=True)
    results = []
    metrics = {}
    t_start = time.time()

    n_eval = (max(args.videos // 5, 2000) // 4) * 4
    shards = max(args.videos // 2000, 1)
    n_train = (args.videos // shards) * shards
    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from yt8m_tpu.data.synthetic import write_dataset; "
        "write_dataset(%r, 'train', num_shards=%d, videos_per_shard=%d, "
        "frame_level=True, num_classes=4716, seed=11, label_dropout=%r); "
        "write_dataset(%r, 'validate', num_shards=4, videos_per_shard=%d, "
        "frame_level=True, num_classes=4716, seed=88)"
        % (REPO, data, shards, n_train // shards, args.label_dropout,
           data, n_eval // 4)
    )
    run_stage(
        "generate_data", [sys.executable, "-c", gen], results,
        env_extra={"JAX_PLATFORMS": "cpu"},
    )

    common = [
        "--feature_names=rgb,audio", "--feature_sizes=1024,128",
        "--frame_features=True", "--num_classes=4716",
        "--num_readers=2", "--batch_size=256",
    ]
    teacher_flags = [
        "--model=GatedNetVladModel",
        "--netvlad_cluster_size=128", "--netvlad_hidden_size=1024",
    ]
    student_flags = [
        "--model=DbofModel",
        "--dbof_cluster_size=2048", "--dbof_hidden_size=1024",
    ]
    epochs = [f"--num_epochs={args.epochs}",
              "--base_learning_rate=0.001",
              "--log_every_n_steps=50"]

    def evaluate(tag, tdir, model_flags):
        out_ = run_stage(
            f"eval_{tag}",
            [sys.executable, "eval.py",
             f"--eval_data_pattern={data}/validate-*.tfrecord",
             f"--train_dir={tdir}", "--run_once=True",
             "--batch_size=512"]
            + [f for f in common if not f.startswith("--batch_size")]
            + model_flags,
            results,
        )
        metrics[f"gap_{tag}"] = last_gap(out_)
        print(json.dumps({"gap_" + tag: metrics[f"gap_{tag}"]}), flush=True)

    # ---- distillation chain -------------------------------------------
    tdir_teacher = os.path.join(out, "teacher")
    run_stage(
        "train_teacher",
        [sys.executable, "train.py",
         f"--train_data_pattern={data}/train-*.tfrecord",
         f"--train_dir={tdir_teacher}"] + common + teacher_flags + epochs,
        results,
    )
    evaluate("teacher", tdir_teacher, teacher_flags)

    probs_dir = os.path.join(out, "teacher_train_probs")
    run_stage(
        "teacher_dump_train_split",
        [sys.executable, "inference.py",
         f"--input_data_pattern={data}/train-*.tfrecord",
         f"--train_dir={tdir_teacher}",
         f"--output_probabilities_dir={probs_dir}", "--output_file="]
        + common + teacher_flags,
        results,
    )

    distill_data = os.path.join(out, "distill_data")
    inject = (
        "import sys; sys.path.insert(0, %r); "
        "from yt8m_tpu.ensemble.distill import ("
        "teacher_from_prediction_dir, write_distill_dataset); "
        "t = teacher_from_prediction_dir(%r); "
        "n = write_distill_dataset(%r, t, %r, frame_level=True, "
        "top_k_sparsify=64); print('annotated', n)"
        % (REPO, probs_dir, f"{data}/train-*.tfrecord", distill_data)
    )
    run_stage(
        "write_distill_dataset", [sys.executable, "-c", inject], results,
        env_extra={"JAX_PLATFORMS": "cpu"},
    )

    tdir_ce = os.path.join(out, "student_ce")
    run_stage(
        "train_student_ce_only",
        [sys.executable, "train.py",
         f"--train_data_pattern={data}/train-*.tfrecord",
         f"--train_dir={tdir_ce}"] + common + student_flags + epochs,
        results,
    )
    evaluate("student_ce", tdir_ce, student_flags)

    tdir_distill = os.path.join(out, "student_distill")
    run_stage(
        "train_student_distilled",
        [sys.executable, "train.py",
         f"--train_data_pattern={distill_data}/train-*.tfrecord",
         "--distill_data_pattern=teacher",
         "--label_loss=MixedCrossEntropyDistillLoss",
         "--distill_alpha=0.5",
         f"--train_dir={tdir_distill}"]
        + common + student_flags + epochs,
        results,
    )
    evaluate("student_distill", tdir_distill, student_flags)

    # ---- boosting chain (member1 = the CE student, reused) ------------
    m1_probs = os.path.join(out, "member1_train_probs")
    run_stage(
        "member1_dump_train_split",
        [sys.executable, "inference.py",
         f"--input_data_pattern={data}/train-*.tfrecord",
         f"--train_dir={tdir_ce}",
         f"--output_probabilities_dir={m1_probs}", "--output_file="]
        + common + student_flags,
        results,
    )
    bw = os.path.join(out, "boost_weights.npz")
    run_stage(
        "fit_boost_weights",
        [sys.executable, "-m", "yt8m_tpu.ensemble.boosting",
         f"--predictions_dir={m1_probs}",
         f"--train_data_pattern={data}/train-*.tfrecord",
         f"--output={bw}"],
        results,
        env_extra={"JAX_PLATFORMS": "cpu"},
    )
    tdir_m2 = os.path.join(out, "member2")
    run_stage(
        "train_member2_boosted",
        [sys.executable, "train.py",
         f"--train_data_pattern={data}/train-*.tfrecord",
         f"--boost_weights_file={bw}",
         f"--train_dir={tdir_m2}"] + common + student_flags + epochs,
        results,
    )
    evaluate("member2", tdir_m2, student_flags)

    val_probs = {}
    for tag, tdir in (("member1", tdir_ce), ("member2", tdir_m2)):
        val_probs[tag] = os.path.join(out, f"{tag}_val_probs")
        run_stage(
            f"{tag}_dump_validate",
            [sys.executable, "inference.py",
             f"--input_data_pattern={data}/validate-*.tfrecord",
             f"--train_dir={tdir}",
             f"--output_probabilities_dir={val_probs[tag]}",
             "--output_file="] + common + student_flags,
            results,
        )
    ens_out = run_stage(
        "ensemble_fit_and_csv",
        [sys.executable, "-m", "yt8m_tpu.cli.ensemble",
         "--member_dirs=%s,%s" % (val_probs["member1"], val_probs["member2"]),
         "--fit_weights",
         f"--eval_labels_pattern={data}/validate-*.tfrecord",
         f"--output_file={os.path.join(out, 'boosted.csv')}"],
        results,
        env_extra={"JAX_PLATFORMS": "cpu"},
    )
    m = re.findall(r"GAP[:= ]+([0-9.]+)", ens_out)
    if m:
        metrics["gap_boosted_ensemble"] = float(m[-1])

    summary = {
        "stage": "SUMMARY",
        "total_wall_min": round((time.time() - t_start) / 60, 1),
        "train_videos": n_train,
        "eval_videos": n_eval,
        "label_dropout": args.label_dropout,
        "distill_beats_ce": (
            metrics.get("gap_student_distill", 0)
            > metrics.get("gap_student_ce", 0)
        ),
        "ensemble_beats_best_member": (
            metrics.get("gap_boosted_ensemble", 0)
            >= max(
                metrics.get("gap_student_ce", 0),
                metrics.get("gap_member2", 0),
            )
        ),
        "metrics": metrics,
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024, 1
        ),
        "stages": results,
    }
    print(json.dumps(summary), flush=True)
    if not args.keep:
        shutil.rmtree(data, ignore_errors=True)
        shutil.rmtree(distill_data, ignore_errors=True)


if __name__ == "__main__":
    main()
