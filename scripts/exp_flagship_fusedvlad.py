#!/usr/bin/env python
"""Fused NetVLAD TRAIN core re-evaluation at the r3 flagship working
point (B=512, bf16 Adam mu).

r2 measured the custom-VJP fused aggregation 4% SLOWER than the XLA
graph at B=256/K=256 on GatedNetVladModel (the step is Adam-HBM-bound)
and shipped it default-off. The r3 flagship recipe moved to B=512,
where the UNFUSED path materialises the [B, F, K] f32 assignment
(512*300*256*4 = 157 MB) plus its bwd re-reads — HBM traffic the fused
flash-style core never writes. Re-measure on the REAL flagship
(NetVladLstmModel) full train step, one process, back-to-back.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VARIANTS = [
    # (label, batch, fused_vlad)
    ("B512_xla_vlad", 512, False),
    ("B512_fused_vlad", 512, True),
    ("B256_xla_vlad", 256, False),
    ("B256_fused_vlad", 256, True),
]


def main():
    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    mesh = mesh_lib.make_mesh()
    loss = get_loss("CrossEntropyLoss")

    results = {}
    for label, batch, fused in VARIANTS:
        hp = ModelHParams(
            netvlad_cluster_size=256, netvlad_hidden_size=1024,
            lstm_cells=1024, lstm_layers=2, moe_num_mixtures=4,
            netvlad_fused_train=fused,
        )
        model = get_model("NetVladLstmModel", hp)
        rng = np.random.default_rng(0)
        batch_np = {
            "features": rng.integers(
                0, 256, size=(batch, 300, 1152), dtype=np.uint8
            ),
            "labels": (rng.random((batch, 4716)) < 0.002).astype(
                np.float32
            ),
            "num_frames": rng.integers(30, 301, size=(batch,)).astype(
                np.int32
            ),
            "batch_mask": np.ones((batch,), np.float32),
        }
        tx = make_optimizer(
            global_batch_size=batch, adam_mu_dtype="bfloat16"
        )
        state = init_train_state(
            model, jax.random.PRNGKey(0), batch_np, tx, True
        )
        state = jax.device_put(
            state,
            jax.tree_util.tree_map(
                lambda _: mesh_lib.replicated(mesh), state
            ),
        )
        device_batch = mesh_lib.shard_batch(batch_np, mesh)
        step_fn = make_train_step(model, loss)
        key = jax.random.PRNGKey(1)

        state, metrics = step_fn(state, device_batch, key)
        first_loss = float(jax.device_get(metrics["loss"]))
        steps = 15
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step_fn(
                state, device_batch, jax.random.fold_in(key, i)
            )
        _ = jax.device_get(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        results[label] = round(dt * 1e3, 2)
        print(
            json.dumps(
                {
                    "variant": label,
                    "step_ms": round(dt * 1e3, 2),
                    "videos_per_sec_per_chip": round(batch / dt, 1),
                    "first_step_loss": round(first_loss, 4),
                }
            ),
            flush=True,
        )
        del state, device_batch, step_fn

    print(json.dumps(results))


if __name__ == "__main__":
    main()
