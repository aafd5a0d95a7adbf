#!/usr/bin/env python
"""A/B the fused NeXtVLAD TRAIN core (kernels/nextvlad_train.py)
against the XLA train path on-chip.

The r3 profile (scripts/profile_nextvlad_train.py) showed the
aggregation's value_and_grad is ~86% of the 43 ms step at B=256 —
NOT Adam-bound — so this measures the FULL donated train step
(make_train_step) with --nextvlad_train_fused off vs on at B=256 and
B=512, and checks first-step loss parity between the two paths.

Tunnel variance +-4-7%: compare within one run only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

F, D = 300, 1152
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "10"))


def run(b, fused):
    import dataclasses

    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    hp = dataclasses.replace(ModelHParams(), nextvlad_train_fused=fused)
    model = get_model("NeXtVladModel", hp)
    loss = get_loss("CrossEntropyLoss")
    # Single-device mesh: this A/B times the plain-jit step factory on
    # the one local chip; a multi-device mesh here would bypass the
    # Trainer's manual shard_map path and fail at Mosaic lowering.
    mesh = mesh_lib.make_mesh(1)

    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.integers(0, 256, (b, F, D), dtype=np.uint8),
        "labels": (rng.random((b, 4716)) < 0.002).astype(np.float32),
        "num_frames": rng.integers(30, F + 1, (b,)).astype(np.int32),
        "batch_mask": np.ones((b,), np.float32),
    }
    tx = make_optimizer(global_batch_size=b)
    state = init_train_state(model, jax.random.PRNGKey(0), batch_np, tx, True)
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state),
    )
    device_batch = mesh_lib.shard_batch(batch_np, mesh)
    step_fn = make_train_step(model, loss)
    key = jax.random.PRNGKey(1)

    state2, metrics = step_fn(state, device_batch, key)
    first_loss = float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(STEPS):
        state2, metrics = step_fn(
            state2, device_batch, jax.random.fold_in(key, i)
        )
    _ = jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    tag = "fused" if fused else "xla  "
    print(
        f"B={b} {tag}  {dt*1e3:8.2f} ms  -> {b/dt:7.0f} videos/s/chip  "
        f"first_step_loss={first_loss:.4f}",
        flush=True,
    )
    del state, state2, step_fn
    return dt, first_loss


def main():
    results = {}
    for b in (256, 512):
        for fused in (False, True):
            dt, fl = run(b, fused)
            results[f"B{b}_{'fused' if fused else 'xla'}_ms"] = round(
                dt * 1e3, 2
            )
            results[f"B{b}_{'fused' if fused else 'xla'}_loss"] = round(
                fl, 4
            )
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
