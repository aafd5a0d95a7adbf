#!/usr/bin/env python
"""Fused-vs-XLA NeXtVLAD TRAIN trajectory A/B (VERDICT r3 weak #2).

The fused custom-VJP NeXtVLAD train core shipped default-ON in r3 on
one-step evidence (loss parity to 5 digits, worst on-chip grad rel-err
0.43%). The repo's own bar for a default-ON gradient kernel is higher —
the LSTM/GRU cores shipped with trajectory-divergence measurements and
GatedNetVLAD was soaked to convergence. This experiment trains the SAME
synthetic planted-signal stream (identical batches, identical init) for
N steps with nextvlad_train_fused ON vs OFF and reports:

  - loss curves (every 25 steps) and their max/mean absolute gap,
  - final param relative drift per layer class,
  - held-out GAP@20 of both arms (the number that decides the default).

Synthetic stream: the data/synthetic.py planted-signal construction
(per-video label-direction mean + per-frame noise, uint8-quantized),
generated ON DEVICE in a jitted function of the step seed — wire
format is irrelevant to a gradient A/B, the LEARNABILITY is what
matters. Labels draw from the first YT8M_EXP_ACTIVE (default 512) of
the 4716 classes so 300 steps reach a measurably-nonzero GAP (the
full-vocabulary draw left both arms at GAP 0.0000 — meaningless for
the A/B); kernel shapes stay the real C=4716. History of the batch
path (why on-device):
  1. pre-materialized 300-batch list — 27 GB host RSS + ~35 min
     single-core stall before step 1;
  2. per-step host numpy regen — ~3.3 s/step (88.5 MB gen + uint8
     transfer per step), 17.5 min/arm, kept outliving the chip-queue
     stage budget, and the per-step host->device transfer is exactly
     the axon-relay RSS retention documented in BENCH_NOTES;
  3. (current) jax.random gen inside jit keyed by the step seed —
     identical streams in both arms (same seeds, same backend),
     zero host work, zero transfer, zero RSS growth.

Arms still run as SEPARATE invocations persisting their results
(losses, held-out GAP, final params) to YT8M_EXP_OUT, and a report
invocation combines whatever is on disk — a dead session costs one
arm, not the whole A/B.

Usage (chip):  YT8M_EXP_ARM=xla   python scripts/exp_nextvlad_train_trajectory.py
               YT8M_EXP_ARM=fused python scripts/exp_nextvlad_train_trajectory.py
               YT8M_EXP_ARM=report python scripts/exp_nextvlad_train_trajectory.py
Smoke (CPU):   YT8M_EXP_TINY=1 YT8M_FORCE_CPU=1 YT8M_PALLAS_INTERPRET=1 \
               python scripts/exp_nextvlad_train_trajectory.py   # both arms

Env: YT8M_EXP_STEPS (default 300), YT8M_EXP_BATCH (default 256),
     YT8M_EXP_ARM (xla|fused|both|report, default both),
     YT8M_EXP_OUT (default /tmp/nextvlad_traj).
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.metrics import calculate_gap
from yt8m_tpu.models import get_model
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.losses import get_loss
from yt8m_tpu.train.state import init_train_state, make_optimizer
from yt8m_tpu.train.step import make_predict_step, make_train_step

TINY = os.environ.get("YT8M_EXP_TINY") == "1"
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "20" if TINY else "300"))
B = int(os.environ.get("YT8M_EXP_BATCH", "16" if TINY else "256"))
C = 64 if TINY else 4716
D = 32 if TINY else 1152
F = 16 if TINY else 300
EVAL_B = 8 * B
# Labels live in the first ACTIVE classes (learnable at 300 steps);
# the model/loss/metrics still run the full C.
ACTIVE = int(os.environ.get("YT8M_EXP_ACTIVE", str(min(512, C))))
ARM = os.environ.get("YT8M_EXP_ARM", "both")
OUT_DIR = os.environ.get("YT8M_EXP_OUT", "/tmp/nextvlad_traj")


def _class_dirs() -> np.ndarray:
    """Per-class unit directions, matching data/synthetic.py's
    _planted_features (seeded per class). Only ACTIVE classes carry
    labels, so only those need directions."""
    dirs = np.empty((ACTIVE, D), np.float32)
    for c in range(ACTIVE):
        g = np.random.default_rng(1000 + c).normal(0.0, 1.0, size=(D,))
        dirs[c] = g / (np.linalg.norm(g) + 1e-8)
    return dirs


DIRS = _class_dirs()


def _gen_batch(seed, b: int) -> dict:
    """On-device planted-signal batch, deterministic in `seed`.

    Same construction as the old host numpy path (1-3 labels from the
    first ACTIVE classes, 1.5x summed label directions + N(0, 0.6)
    video mean + N(0, 0.3) frame noise, uint8-quantized to the
    data/quantize.py wire format) but drawn with jax.random so the
    whole batch materializes in HBM: both arms run the same seeds on
    the same backend, so their streams are bitwise-identical without
    a single host->device transfer.
    """
    key = jax.random.fold_in(jax.random.PRNGKey(424_242), seed)
    kk, kc, kb, kn, kf = jax.random.split(key, 5)
    # ~Zipf-lite label draw: 1-3 labels (duplicates allowed, exactly
    # like the numpy fancy-index version summed duplicate directions).
    k = jax.random.randint(kk, (b,), 1, 4)
    cls = jax.random.randint(kc, (b, 3), 0, ACTIVE)
    sel = (jnp.arange(3)[None, :] < k[:, None]).astype(jnp.float32)
    onehot = jax.nn.one_hot(cls, C, dtype=jnp.float32)
    labels = jnp.minimum((onehot * sel[..., None]).sum(axis=1), 1.0)
    dirs = jnp.asarray(DIRS)
    base = 0.6 * jax.random.normal(kb, (b, D), jnp.float32)
    base = base + 1.5 * (dirs[cls] * sel[..., None]).sum(axis=1)
    nf = jax.random.randint(kf, (b,), max(4, F // 4), F + 1)
    noise = 0.3 * jax.random.normal(kn, (b, F, D), jnp.float32)
    x = jnp.clip(base[:, None, :] + noise, -2.0, 2.0)
    feats = jnp.round((x + 2.0) * (255.0 / 4.0)).astype(jnp.uint8)
    return {
        "features": feats,
        "labels": labels,
        "num_frames": nf.astype(jnp.int32),
        "batch_mask": jnp.ones((b,), jnp.float32),
    }


gen_batch = jax.jit(_gen_batch, static_argnums=1)


def run_arm(fused: bool, eval_batch):
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        nextvlad_train_fused=fused,
    )
    if TINY:
        hp = hp.replace(
            nextvlad_groups=4, nextvlad_expansion=2,
            nextvlad_cluster_size=8, nextvlad_hidden_size=16,
            compute_dtype="float32",
        )
    model = get_model("NeXtVladModel", hp)
    tx = make_optimizer(global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0),
        jax.device_get(gen_batch(10_000, B)), tx,
        frame_level=True,
    )
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    # Losses stay ON DEVICE until the end: a per-step device_get is a
    # tunnel roundtrip that serializes the stream of async dispatches.
    # Batches are generated on device from the step seed (identical in
    # both arms — seeds are shared).
    loss_devs = []
    t0 = time.perf_counter()
    for i in range(STEPS):
        db = gen_batch(10_000 + i, B)
        state, metrics = step_fn(state, db, jax.random.PRNGKey(50 + i))
        loss_devs.append(metrics["loss"])
        if (i + 1) % 50 == 0:
            # One fetch per 50 steps: cheap, and partial logs stay
            # informative if the run dies mid-arm.
            print(
                f"  step {i + 1}/{STEPS} "
                f"loss={float(loss_devs[-1]):.5f}",
                flush=True,
            )
    losses = [float(x) for x in jax.device_get(loss_devs)]
    dt = time.perf_counter() - t0
    pred_fn = make_predict_step(model)
    preds = np.asarray(
        jax.device_get(
            pred_fn(state, eval_batch, jax.random.PRNGKey(99))
        )
    )
    gap = calculate_gap(preds, np.asarray(eval_batch["labels"]))
    return losses, gap, jax.device_get(state.params), dt


def _save_arm(name, losses, gap, params, dt):
    os.makedirs(OUT_DIR, exist_ok=True)
    flat = jax.tree_util.tree_leaves_with_path(params)
    arrs = {
        "p:" + jax.tree_util.keystr(k): np.asarray(v) for k, v in flat
    }
    np.savez(
        os.path.join(OUT_DIR, f"{name}.npz"),
        losses=np.asarray(losses, np.float64),
        gap=np.float64(gap),
        dt=np.float64(dt),
        **arrs,
    )


def _load_arm(name):
    path = os.path.join(OUT_DIR, f"{name}.npz")
    z = np.load(path)
    params = {k[2:]: z[k] for k in z.files if k.startswith("p:")}
    return (
        [float(x) for x in z["losses"]],
        float(z["gap"]),
        params,
        float(z["dt"]),
    )


def main():
    print(
        f"NeXtVLAD train trajectory A/B: steps={STEPS} B={B} C={C} "
        f"D={D} F={F} backend={jax.default_backend()} arm={ARM}",
        flush=True,
    )
    eval_batch = (
        None if ARM == "report" else gen_batch(777_777, EVAL_B)
    )

    if ARM in ("xla", "both"):
        loss_x, gap_x, params_x, dt_x = run_arm(False, eval_batch)
        print(
            f"xla arm done in {dt_x:.1f}s gap={gap_x:.4f}", flush=True
        )
        _save_arm("xla", loss_x, gap_x, params_x, dt_x)
    if ARM in ("fused", "both"):
        loss_f, gap_f, params_f, dt_f = run_arm(True, eval_batch)
        print(
            f"fused arm done in {dt_f:.1f}s gap={gap_f:.4f}", flush=True
        )
        _save_arm("fused", loss_f, gap_f, params_f, dt_f)
    if ARM not in ("both", "report"):
        return

    loss_x, gap_x, params_x, dt_x = _load_arm("xla")
    loss_f, gap_f, params_f, dt_f = _load_arm("fused")
    gaps = np.abs(np.asarray(loss_f) - np.asarray(loss_x))
    curve = {
        str(i): (round(loss_x[i], 5), round(loss_f[i], 5))
        for i in range(0, STEPS, max(1, STEPS // 12))
    }
    drift = {}
    for name, vx in params_x.items():
        vf = params_f[name]
        denom = float(np.max(np.abs(vx))) + 1e-12
        drift[name] = round(float(np.max(np.abs(vx - vf))) / denom, 6)
    worst = sorted(drift.items(), key=lambda kv: -kv[1])[:8]
    out = {
        "steps": STEPS,
        "batch": B,
        "final_loss_xla": loss_x[-1],
        "final_loss_fused": loss_f[-1],
        "max_abs_loss_gap": float(gaps.max()),
        "mean_abs_loss_gap": float(gaps.mean()),
        "gap_xla": round(float(gap_x), 5),
        "gap_fused": round(float(gap_f), 5),
        "loss_curve_(xla,fused)": curve,
        "worst_param_rel_drift": worst,
        "arm_seconds": [round(dt_x, 1), round(dt_f, 1)],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
