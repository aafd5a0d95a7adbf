#!/usr/bin/env python
"""Measure what --async_checkpoint hides, at flagship state size.

The flagship train state is ~411M params + Adam moments (~4.6 GB f32).
The synchronous save path blocks the train loop on device->host copy +
orbax serialization + disk write; the async path blocks only on the
copy. This times, one process:
  1. sync  save() wall-clock            (device_get + write, blocking)
  2. async save() wall-clock            (should be ~the device_get)
  3. async wait_until_finished() extra  (the hidden background write)
and a mini train loop (10 steps, save every 5) in both modes to show
the step-rate effect end to end.

Run on-chip; YT8M_CKPT_DIR overrides the scratch dir (default /tmp).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# The axon site package force-sets JAX_PLATFORMS=axon at import; only a
# config.update wins over it (needed for the CPU smoke).
if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.models import ModelHParams, get_model
from yt8m_tpu.parallel import mesh as mesh_lib
from yt8m_tpu.train.checkpoint import CheckpointManager
from yt8m_tpu.train.losses import get_loss
from yt8m_tpu.train.state import init_train_state, make_optimizer
from yt8m_tpu.train.step import make_train_step

B = int(os.environ.get("YT8M_BENCH_BATCH", "256"))
ROOT = os.environ.get("YT8M_CKPT_DIR", "/tmp/yt8m_async_ckpt_bench")


def main():
    mesh = mesh_lib.make_mesh()
    hp = ModelHParams(
        netvlad_cluster_size=256, netvlad_hidden_size=1024,
        lstm_cells=1024, lstm_layers=2, moe_num_mixtures=4,
    )
    if os.environ.get("YT8M_EXP_TINY") == "1":
        hp = hp.replace(
            vocab_size=64, feature_dim=32, max_frames=16,
            netvlad_cluster_size=8, netvlad_hidden_size=32,
            lstm_cells=16,
        )
    model = get_model("NetVladLstmModel", hp)
    loss = get_loss("CrossEntropyLoss")
    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.integers(
            0, 256, size=(B, hp.max_frames, hp.feature_dim), dtype=np.uint8
        ),
        "labels": (rng.random((B, hp.vocab_size)) < 0.002).astype(np.float32),
        "num_frames": rng.integers(
            min(30, hp.max_frames), hp.max_frames + 1, size=(B,)
        ).astype(np.int32),
        "batch_mask": np.ones((B,), np.float32),
    }
    tx = make_optimizer(global_batch_size=B)
    state0 = init_train_state(model, jax.random.PRNGKey(0), batch_np, tx, True)
    state0 = jax.device_put(
        state0,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state0),
    )
    device_batch = mesh_lib.shard_batch(batch_np, mesh)
    step_fn = make_train_step(model, loss)
    key = jax.random.PRNGKey(1)
    nbytes = sum(
        x.nbytes for x in jax.tree_util.tree_leaves(state0)
        if hasattr(x, "nbytes")
    )
    print(f"state size: {nbytes/1e9:.2f} GB", flush=True)

    results = {}
    for mode, async_save in (("sync", False), ("async", True)):
        d = os.path.join(ROOT, mode)
        shutil.rmtree(d, ignore_errors=True)
        mgr = CheckpointManager(d, max_to_keep=2, save_interval_steps=1,
                                async_save=async_save)
        state = jax.tree_util.tree_map(lambda x: x + 0, state0)  # fresh copy
        state, m = step_fn(state, device_batch, key)  # warm
        _ = jax.device_get(m["loss"])

        t0 = time.perf_counter()
        mgr.save(1, state)
        t_save = time.perf_counter() - t0
        t0 = time.perf_counter()
        mgr.wait_until_finished()
        t_wait = time.perf_counter() - t0
        results[f"{mode}_save_s"] = round(t_save, 3)
        results[f"{mode}_drain_s"] = round(t_wait, 3)
        print(f"{mode}: save() {t_save:.3f}s drain {t_wait:.3f}s", flush=True)

        # mini loop: 10 steps, save every 5 (interval enforced by caller
        # here since save_interval_steps=1 above)
        t0 = time.perf_counter()
        for i in range(2, 12):
            state, m = step_fn(
                state, device_batch, jax.random.fold_in(key, i)
            )
            if i % 5 == 0:
                mgr.save(i, state)
        _ = jax.device_get(m["loss"])
        mgr.wait_until_finished()
        loop_s = time.perf_counter() - t0
        results[f"{mode}_loop10_s"] = round(loop_s, 3)
        print(f"{mode}: 10-step loop with 2 saves: {loop_s:.3f}s", flush=True)
        mgr.close()
        del state

    print(json.dumps(results))


if __name__ == "__main__":
    main()
