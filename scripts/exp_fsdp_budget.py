#!/usr/bin/env python
"""Settle FSDP x fused kernels for the flagship, with numbers (r3 #2).

The manual shard_map train step (train/step.py :: _make_manual_train_step)
keeps the fused Pallas train kernels on data-only multi-device meshes, for
BOTH replicated (DP) and FSDP-sharded params — so the r3 question "DP-only
-fused vs FSDP-unfused" dissolved into "DP-fused vs FSDP-fused: which does
the 2 h budget ride on?". Multi-chip hardware is unavailable (one v5e chip
behind the axon tunnel), so this measures every single-chip term of that
decision and prints the v5e-8 arithmetic with the ICI terms clearly marked
as estimates:

  1. FULL fused donated flagship step, B=512, bf16 mu
       -> the compute term. Identical for DP and FSDP (the all-gather is
          the only extra FSDP compute-path op).
  2. Same step with the train kernels OFF (lstm_use_pallas=False)
       -> what multi-chip training ran before the manual shard_map step;
          quantifies what the fix preserves at the north-star config.
  3. Adam+clip update standalone (bf16 mu): full 411M tree vs the
     FSDP-8 LOCAL tree (dim-0 1/8 slices of every leaf the
     parallel/mesh.py policy would shard at --fsdp_min_size=1048576)
       -> FSDP's measured per-chip optimizer saving.
  4. Param/grad byte counts for the ICI estimates.

v5e-8 budget arithmetic printed at the end (ESTIMATED ici terms):
  - DP-fused:   t_step + t_allreduce(grads f32)      [worst: no overlap]
  - FSDP-fused: t_step - adam_saving + t_gather+scatter(params+grads)
ICI model (jax-ml scaling book, v5e): 45 GB/s per link per direction;
a 2D-mesh all-reduce of V bytes moves ~2*V*(n-1)/n per chip; achievable
per-chip collective bandwidth taken as 45 (1 ring) to 90 GB/s (2 axes).

Usage (chip):  python scripts/exp_fsdp_budget.py
Smoke (CPU):   YT8M_EXP_TINY=1 YT8M_FORCE_CPU=1 python scripts/exp_fsdp_budget.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TINY = os.environ.get("YT8M_EXP_TINY") == "1"
# At B=512 the FUSED step fits and measures 139.16 ms (3,679
# videos/s/chip, r4 chip queue — matching r3's 140.23 ms) but the
# UNFUSED (scan-path) arm OOMs at compile: 16.20 of 15.75 GB HBM,
# 47.9% fragmentation — the scan recurrence materializes per-step
# activations the custom-VJP kernel never allocates. Default B=256
# so both arms fit in one process; set YT8M_EXP_BATCH=512
# YT8M_EXP_UNFUSED=0 for the recipe working point, fused arm only.
B = int(os.environ.get("YT8M_EXP_BATCH", "16" if TINY else "256"))
SKIP_UNFUSED = os.environ.get("YT8M_EXP_UNFUSED") == "0"
F, D, C = (16, 32, 64) if TINY else (300, 1152, 4716)
STEPS = 3 if TINY else 10
N_CHIPS = 8
FSDP_MIN = 1 << 20  # the --fsdp_min_size a v5e-8 run would use


def timed(fn, *args, label="", n=STEPS):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    hp = ModelHParams(
        netvlad_cluster_size=4 if TINY else 256,
        netvlad_hidden_size=16 if TINY else 1024,
        lstm_cells=16 if TINY else 1024,
        lstm_layers=2,
        moe_num_mixtures=4,
        vocab_size=C,
        feature_dim=D,
        max_frames=F,
    )
    loss = get_loss("CrossEntropyLoss")
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.integers(0, 256, size=(B, F, D), dtype=np.uint8),
        "labels": (rng.random((B, C)) < 0.002).astype(np.float32),
        "num_frames": rng.integers(
            min(30, F // 2), F + 1, size=(B,)
        ).astype(np.int32),
        "batch_mask": np.ones((B,), np.float32),
    }
    key = jax.random.PRNGKey(1)
    tx = make_optimizer(global_batch_size=B, adam_mu_dtype="bfloat16")

    results = {}

    # ---- 1+2: full fused vs unfused donated step -----------------------
    step_times = {}
    for fused in ((True,) if SKIP_UNFUSED else (True, False)):
        hp_arm = hp if fused else hp.replace(lstm_use_pallas=False)
        model = get_model("NetVladLstmModel", hp_arm)
        state = init_train_state(
            model, jax.random.PRNGKey(0), batch, tx, True
        )
        if fused:
            n_params = sum(
                int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(state.params)
            )
            results["params_millions"] = round(n_params / 1e6, 1)
            print(f"flagship params: {n_params / 1e6:.1f}M", flush=True)
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        step_fn = make_train_step(model, loss)
        tag = "fused" if fused else "unfused(pre-fix multi-chip)"
        try:
            st, m = step_fn(state, db, key)
            _ = jax.device_get(m["loss"])
        except jax.errors.JaxRuntimeError as e:
            # The unfused scan arm OOMs at the B=512 working point
            # (16.20 of 15.75 GB HBM): that IS the finding — the scan
            # recurrence materializes per-step activations the
            # custom-VJP kernels never allocate. Record it and keep
            # the rest of the budget terms.
            if fused:
                raise
            print(
                f"{'FULL step B=%d bf16-mu %s' % (B, tag):52s} "
                f"DID NOT COMPILE: {str(e).splitlines()[0][:120]}",
                flush=True,
            )
            results["step_unfused"] = "OOM"
            del state
            continue
        t0 = time.perf_counter()
        for i in range(STEPS):
            st, m = step_fn(st, db, jax.random.fold_in(key, i))
        _ = jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        print(
            f"{'FULL step B=%d bf16-mu %s' % (B, tag):52s} {dt * 1e3:8.2f} ms"
            f"  ({B / dt:,.0f} videos/s/chip)",
            flush=True,
        )
        step_times[tag] = dt
        del st, state

    results["step_ms_fused"] = round(step_times["fused"] * 1e3, 2)
    if "unfused(pre-fix multi-chip)" in step_times:
        results["step_ms_unfused"] = round(
            step_times["unfused(pre-fix multi-chip)"] * 1e3, 2
        )

    # ---- 3: Adam+clip standalone, full vs FSDP-8 local tree ------------
    model = get_model("NetVladLstmModel", hp)
    state = init_train_state(model, jax.random.PRNGKey(0), batch, tx, True)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * 1e-3, state.params
    )

    import optax

    def make_adam_fn(tx_):
        @jax.jit
        def upd(params, opt_state, g):
            updates, new_opt = tx_.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        return upd

    def shard_leaf(p):
        """The FSDP-8 LOCAL slice per parallel/mesh.py :: param_spec."""
        if (
            p.ndim >= 1
            and p.size >= FSDP_MIN
            and p.shape[0] % N_CHIPS == 0
        ):
            return p[: p.shape[0] // N_CHIPS]
        return p

    adam_fn = make_adam_fn(tx)
    full_opt = jax.jit(tx.init)(state.params)
    t_full = timed(
        lambda p, o, g: adam_fn(p, o, g)[0],
        state.params,
        full_opt,
        grads,
        label="adam+clip (bf16 mu) FULL 411M tree",
    )

    local_params = jax.tree_util.tree_map(shard_leaf, state.params)
    local_grads = jax.tree_util.tree_map(shard_leaf, grads)
    n_local = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(local_params)
    )
    results["fsdp_local_params_millions"] = round(n_local / 1e6, 1)
    local_opt = jax.jit(tx.init)(local_params)
    t_local = timed(
        lambda p, o, g: adam_fn(p, o, g)[0],
        local_params,
        local_opt,
        local_grads,
        label=f"adam+clip (bf16 mu) FSDP-8 local tree ({n_local/1e6:.0f}M)",
    )
    results["adam_ms_full"] = round(t_full * 1e3, 2)
    results["adam_ms_fsdp_local"] = round(t_local * 1e3, 2)
    adam_saving = t_full - t_local

    # ---- 4: byte counts + the v5e-8 arithmetic (ICI terms ESTIMATED) ---
    grad_bytes = sum(
        int(np.prod(p.shape)) * 4
        for p in jax.tree_util.tree_leaves(state.params)
    )
    sharded_bytes = sum(
        int(np.prod(p.shape)) * 4
        for p in jax.tree_util.tree_leaves(state.params)
        if p.ndim >= 1 and p.size >= FSDP_MIN and p.shape[0] % N_CHIPS == 0
    )
    results["grad_gbytes_f32"] = round(grad_bytes / 1e9, 3)
    results["fsdp_sharded_gbytes"] = round(sharded_bytes / 1e9, 3)

    # Ring all-reduce of V bytes on n chips moves ~2*V*(n-1)/n per chip;
    # all-gather/reduce-scatter each move ~V*(n-1)/n. Achievable per-chip
    # collective bandwidth on the v5e 2D torus: 45 GB/s (single-axis
    # ring) to 90 GB/s (both axes). ESTIMATES - 1 chip available.
    frac = (N_CHIPS - 1) / N_CHIPS
    for bw_label, bw in (("ici_45GBps", 45e9), ("ici_90GBps", 90e9)):
        t_ar = 2 * grad_bytes * frac / bw
        # FSDP: all-gather sharded params fwd (their bwd transpose is the
        # reduce-scatter) + all-reduce of the replicated remainder.
        t_fsdp_comm = (
            2 * sharded_bytes * frac / bw
            + 2 * (grad_bytes - sharded_bytes) * frac / bw
        )
        dp_worst = B / (step_times["fused"] + t_ar)
        fsdp_worst = B / (step_times["fused"] - adam_saving + t_fsdp_comm)
        results[f"est_dp_fused_vps_chip_{bw_label}"] = round(dp_worst)
        results[f"est_fsdp_fused_vps_chip_{bw_label}"] = round(fsdp_worst)
    results["est_dp_fused_vps_chip_overlapped"] = round(
        B / step_times["fused"]
    )
    results["est_fsdp_fused_vps_chip_overlapped"] = round(
        B / (step_times["fused"] - adam_saving)
    )
    if "unfused(pre-fix multi-chip)" in step_times:
        results["unfused_vps_chip"] = round(
            B / step_times["unfused(pre-fix multi-chip)"]
        )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
