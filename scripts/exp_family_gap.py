#!/usr/bin/env python
"""Per-family held-out GAP on the synthetic proxy (VERDICT r4 next #2).

r4 closed the PERF half of the zoo tables (every family has serving +
train videos/s rows); only 2 of 24 registry names had a measured
held-out GAP. This banks the QUALITY half: every registered family
trained briefly on the planted-signal synthetic proxy with the r1
GatedNetVLAD recipe's working point (512 train videos, Zipf(1.3)
labels over the full 4716 classes, 400 steps at B=256, reference
hparams), then scored on 2048 held-out videos with GAP@20.

Chip-time design: the CLI path moves ~35 GB through the axon tunnel
per family (88 MB/step x 400). Instead the 512-video train set
(177 MB u8) and the 2048-video eval set (708 MB) are generated ON
DEVICE once — same construction as data/synthetic.py (per-class unit
directions seeded 1000+c, 1.5x summed label directions + N(0,0.6)
video mean + N(0,0.3) frame noise, uint8-quantized), with the Zipf
labels drawn host-side by the same numpy code path. Per-step cost is
an on-device gather; the tunnel carries only the label multi-hots
once. The host pipeline itself is e2e-covered elsewhere (soak_50k,
soak_distill_boost, test_train_frame_e2e).

Each family's result is persisted to OUT_DIR/<family>.json as soon as
it finishes — a dead session costs one family, and re-runs skip
families already on disk (YT8M_EXP_FORCE=1 to redo). YT8M_EXP_ARM=
report prints the combined table.

Usage (chip):  python scripts/exp_family_gap.py
               YT8M_FAMILY_ONLY=LstmModel,GruModel YT8M_EXP_LR=0.0005 \
                 python scripts/exp_family_gap.py
Smoke (CPU):   YT8M_EXP_TINY=1 YT8M_FORCE_CPU=1 YT8M_PALLAS_INTERPRET=1 \
                 python scripts/exp_family_gap.py
Env: YT8M_EXP_STEPS (400), YT8M_EXP_BATCH (256), YT8M_EXP_OUT
     (/tmp/family_gap), YT8M_EXP_LR (per-family default table below).
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
from yt8m_tpu.models import get_model, is_frame_level_model, list_models
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.losses import get_loss
from yt8m_tpu.train.state import init_train_state, make_optimizer
from yt8m_tpu.train.step import make_predict_step, make_train_step

TINY = os.environ.get("YT8M_EXP_TINY") == "1"
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "6" if TINY else "400"))
B = int(os.environ.get("YT8M_EXP_BATCH", "8" if TINY else "256"))
N_TRAIN = 32 if TINY else 512
N_EVAL = 16 if TINY else 2048
C = 64 if TINY else 4716
D = 32 if TINY else 1152
F = 16 if TINY else 300
OUT_DIR = os.environ.get("YT8M_EXP_OUT", "/tmp/family_gap")
ARM = os.environ.get("YT8M_EXP_ARM", "run")

# Reference-recipe learning rates: train.py's default 0.01 everywhere
# the r1 GatedNetVLAD run used it; recurrent families train at the
# fork's lower rates (the flagship recipe uses 2e-4; 1e-3 converges
# faster at this 512-video scale).
def _default_lr(name: str) -> float:
    if "Lstm" in name or "Gru" in name:
        return 1e-3
    return 1e-2


def _families():
    only = os.environ.get("YT8M_FAMILY_ONLY")
    names = list_models()
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    return names


# --------------------------------------------------------------------
# Dataset: labels host-side (numpy Zipf, same as data/synthetic.py),
# features on device from the per-class planted directions.
# --------------------------------------------------------------------

def _host_labels(n, seed):
    rng = np.random.default_rng(seed)
    multihot = np.zeros((n, C), np.float32)
    for i in range(n):
        k = int(rng.integers(1, 5))
        raw = rng.zipf(1.3, size=4 * k) - 1
        labels = np.unique(raw[raw < C])[:k]
        if labels.size == 0:
            labels = np.array([int(rng.integers(0, C))])
        multihot[i, labels] = 1.0
    num_frames = rng.integers(8 if not TINY else 4, F + 1, size=(n,))
    return multihot, num_frames.astype(np.int32)


def _class_dirs() -> np.ndarray:
    dirs = np.empty((C, D), np.float32)
    for c in range(C):
        g = np.random.default_rng(1000 + c).normal(0.0, 1.0, size=(D,))
        dirs[c] = g / (np.linalg.norm(g) + 1e-8)
    return dirs


def _gen_split(multihot: np.ndarray, seed: int):
    """[N, F, D] uint8 planted-signal frames, resident on device."""
    clean = jnp.asarray(1.5 * (multihot @ _class_dirs()))  # [N, D]

    @jax.jit
    def chunk(key, clean_c):
        kb, kn = jax.random.split(key)
        n = clean_c.shape[0]
        base = clean_c + 0.6 * jax.random.normal(kb, (n, D), jnp.float32)
        x = base[:, None, :] + 0.3 * jax.random.normal(
            kn, (n, F, D), jnp.float32
        )
        x = jnp.clip(x, -2.0, 2.0)
        return jnp.round((x + 2.0) * (255.0 / 4.0)).astype(jnp.uint8)

    out, step = [], 256
    for i in range(0, clean.shape[0], step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        out.append(chunk(key, clean[i : i + step]))
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def run_family(name, data, lr):
    frame = is_frame_level_model(name)
    feats_tr = data["train_frames" if frame else "train_means"]
    hp = ModelHParams(vocab_size=C, feature_dim=D, max_frames=F)
    if TINY:
        hp = hp.replace(
            dbof_cluster_size=64, dbof_hidden_size=32,
            netvlad_cluster_size=8, netvlad_hidden_size=32,
            nextvlad_cluster_size=8, nextvlad_hidden_size=32,
            lstm_cells=16, gru_cells=16,
            attention_hidden_size=16, attention_cluster_size=4,
            cnn_filters=16, cnn_layers=1,
            chain_stages=2, chain_hidden_size=16,
            moe_num_mixtures=2, compute_dtype="float32",
        )
    model = get_model(name, hp)
    tx = make_optimizer(global_batch_size=B, base_learning_rate=lr)
    init_batch = {
        "features": np.asarray(jax.device_get(feats_tr[:2])),
        "labels": np.asarray(data["labels_train"][:2]),
        "num_frames": np.asarray(data["nf_train"][:2]),
        "batch_mask": np.ones((2,), np.float32),
    }
    state = init_train_state(
        model, jax.random.PRNGKey(0), init_batch, tx, frame_level=frame
    )
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))

    labels_tr = jnp.asarray(data["labels_train"])
    nf_tr = jnp.asarray(data["nf_train"])
    n = feats_tr.shape[0]

    # data arrays are ARGUMENTS, not closures: a closed-over device
    # array embeds as an HLO constant (177 MB here) and blows the axon
    # relay's payload limit (the bench.py HTTP-413 lesson).
    @jax.jit
    def take_batch(feats, labels, nf, epoch, slot):
        # per-epoch on-device shuffle, exactly one pass per epoch
        perm = jax.random.permutation(
            jax.random.fold_in(jax.random.PRNGKey(11), epoch),
            feats.shape[0],
        )
        idx = jax.lax.dynamic_slice_in_dim(perm, slot * B, B)
        return {
            "features": jnp.take(feats, idx, axis=0),
            "labels": jnp.take(labels, idx, axis=0),
            "num_frames": jnp.take(nf, idx, axis=0),
            "batch_mask": jnp.ones((B,), jnp.float32),
        }

    per_epoch = max(n // B, 1)
    loss_devs = []
    t0 = time.perf_counter()
    for i in range(STEPS):
        db = take_batch(
            feats_tr, labels_tr, nf_tr, i // per_epoch, i % per_epoch
        )
        state, metrics = step_fn(state, db, jax.random.PRNGKey(50 + i))
        loss_devs.append(metrics["loss"])
    losses = [float(x) for x in jax.device_get(loss_devs)]
    dt = time.perf_counter() - t0

    pred_fn = make_predict_step(model)
    feats_ev = data["eval_frames" if frame else "eval_means"]
    nf_ev = jnp.asarray(data["nf_eval"])
    preds = []
    eb = 512
    for i in range(0, feats_ev.shape[0], eb):
        batch = {
            "features": feats_ev[i : i + eb],
            "num_frames": nf_ev[i : i + eb],
            "labels": jnp.zeros((min(eb, feats_ev.shape[0] - i), C)),
            "batch_mask": jnp.ones((min(eb, feats_ev.shape[0] - i),)),
        }
        preds.append(
            np.asarray(
                jax.device_get(
                    pred_fn(state, batch, jax.random.PRNGKey(99))
                ),
                np.float64,
            )
        )
    preds = np.concatenate(preds, axis=0)
    gap = calculate_gap(preds, np.asarray(data["labels_eval"], np.float64))
    return {
        "family": name,
        "frame_level": frame,
        "steps": STEPS,
        "batch": B,
        "lr": lr,
        "train_videos": int(n),
        "eval_videos": int(preds.shape[0]),
        "first_loss": round(losses[0], 5),
        "final_loss": round(losses[-1], 5),
        "gap": round(float(gap), 4),
        "train_seconds": round(dt, 1),
    }


def main():
    families = _families()
    os.makedirs(OUT_DIR, exist_ok=True)
    if ARM == "report":
        rows = []
        for name in families:
            path = os.path.join(OUT_DIR, f"{name}.json")
            if os.path.exists(path):
                rows.append(json.load(open(path)))
        rows.sort(key=lambda r: -r["gap"])
        print(f"{'family':28s} {'GAP':>7s} {'loss0':>8s} {'lossN':>8s}"
              f" {'lr':>7s} {'s':>6s}")
        for r in rows:
            print(
                f"{r['family']:28s} {r['gap']:7.4f} {r['first_loss']:8.4f}"
                f" {r['final_loss']:8.4f} {r['lr']:7.4f}"
                f" {r['train_seconds']:6.1f}"
            )
        print(json.dumps(rows))
        return

    print(
        f"family GAP: steps={STEPS} B={B} C={C} D={D} F={F} "
        f"train={N_TRAIN} eval={N_EVAL} backend={jax.default_backend()} "
        f"families={len(families)}",
        flush=True,
    )
    labels_train, nf_train = _host_labels(N_TRAIN, 42)
    labels_eval, nf_eval = _host_labels(N_EVAL, 4242)
    data = {
        "labels_train": labels_train,
        "labels_eval": labels_eval,
        "nf_train": nf_train,
        "nf_eval": nf_eval,
    }
    any_frame = any(is_frame_level_model(f) for f in families)
    any_video = not all(is_frame_level_model(f) for f in families)
    if any_frame:
        data["train_frames"] = _gen_split(labels_train, 1)
        data["eval_frames"] = _gen_split(labels_eval, 2)
    if any_video:
        # video-level models consume float mean features; the on-wire
        # mean of quantized frames ≈ the clean base + tiny noise. Use
        # the same construction without the frame axis.
        dirs = _class_dirs()

        def means(mh, seed):
            rng = np.random.default_rng(seed)
            base = 1.5 * (mh @ dirs) + rng.normal(
                0.0, 0.6, size=(mh.shape[0], D)
            )
            return jnp.asarray(np.clip(base, -2, 2).astype(np.float32))

        data["train_means"] = means(labels_train, 7)
        data["eval_means"] = means(labels_eval, 8)

    lr_env = os.environ.get("YT8M_EXP_LR")
    for name in families:
        path = os.path.join(OUT_DIR, f"{name}.json")
        if os.path.exists(path) and os.environ.get("YT8M_EXP_FORCE") != "1":
            print(f"skip {name} (exists)", flush=True)
            continue
        lr = float(lr_env) if lr_env else _default_lr(name)
        t0 = time.perf_counter()
        try:
            row = run_family(name, data, lr)
        except Exception as e:  # noqa: BLE001 — bank the failure, move on
            row = {"family": name, "error": repr(e)[:500], "lr": lr}
        row["wall_seconds"] = round(time.perf_counter() - t0, 1)
        with open(path, "w") as f:
            json.dump(row, f)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
