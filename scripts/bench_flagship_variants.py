#!/usr/bin/env python
"""Flagship (NetVladLstmModel) train-step variants, back-to-back on-chip.

r3 follow-up to the train profile (profile_flagship_train.py): the step
is bound by the LSTM recurrence (roofline) + the 411M-param Adam HBM
traffic, so the landable levers are the tb=128 recurrence tiling (now
default), --adam_mu_dtype=bfloat16, and the B=512 working point (same
optimizer traffic per step amortised over 2x videos). One process, same
data, variants timed consecutively — the honest way to compare through
the axon tunnel (run-to-run variance is +-4-7%).
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
    # (label, batch, adam_mu_dtype)
    ("B256_muf32", 256, "float32"),
    ("B256_mubf16", 256, "bfloat16"),
    ("B512_muf32", 512, "float32"),
    ("B512_mubf16", 512, "bfloat16"),
]


def main():
    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    mesh = mesh_lib.make_mesh()
    hp = ModelHParams(
        netvlad_cluster_size=256, netvlad_hidden_size=1024,
        lstm_cells=1024, lstm_layers=2, moe_num_mixtures=4,
    )
    model = get_model("NetVladLstmModel", hp)
    loss = get_loss("CrossEntropyLoss")

    for label, batch, mu_dtype in VARIANTS:
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
            global_batch_size=batch, adam_mu_dtype=mu_dtype
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
        _ = jax.device_get(metrics["loss"])
        steps = 15
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step_fn(
                state, device_batch, jax.random.fold_in(key, i)
            )
        _ = jax.device_get(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        print(
            json.dumps(
                {
                    "variant": label,
                    "step_ms": round(dt * 1e3, 2),
                    "videos_per_sec_per_chip": round(batch / dt, 1),
                }
            ),
            flush=True,
        )
        del state, device_batch, step_fn


if __name__ == "__main__":
    main()
