#!/usr/bin/env python
"""Auxiliary training-throughput benchmark (videos/sec/chip per model).

Not the driver headline bench (that's bench.py); this measures the jitted
SPMD TRAIN step for the main model families on one chip, to ground the
"NetVLAD-LSTM to GAP>=0.84 in <2h on v5e-8" budget: 2h on 8 chips at the
measured videos/sec/chip ~= how many epochs of the 5.6M-video train split
fit. Prints one JSON line per model.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CASES = [
    # (model, frame_level, batch, hparam overrides)
    ("MoeModel", False, 4096, {}),
    ("DbofModel", True, 512, {"dbof_cluster_size": 8192}),
    ("GatedNetVladModel", True, 256, {"netvlad_cluster_size": 256}),
    ("NetVladLstmModel", True, 256,
     {"netvlad_cluster_size": 256, "lstm_cells": 1024, "lstm_layers": 2}),
    ("LstmModel", True, 256, {"lstm_cells": 1024, "lstm_layers": 2}),
    ("GruModel", True, 256, {"gru_cells": 1024, "gru_layers": 2}),
    ("BiLstmModel", True, 128, {"lstm_cells": 1024, "lstm_layers": 2}),
    # r4 zoo tail (VERDICT r3 missing #4): the families the reference's
    # ensembles leaned on — incl. the chain family's aux-loss graph.
    ("NeXtVladModel", True, 256, {}),
    ("NetFVModel", True, 256, {"netvlad_cluster_size": 256}),
    ("FrameCnnModel", True, 256, {}),
    ("ChainFrameModel", True, 512, {}),
    ("ChainNetVladModel", True, 256, {"netvlad_cluster_size": 256}),
    ("DeepCombineChainModel", True, 512, {}),
]


def main():
    import jax

    # Optional CLI filter: `python bench_train.py LstmModel GruModel`
    wanted = set(sys.argv[1:])
    global CASES
    if wanted:
        CASES = [c for c in CASES if c[0] in wanted]

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    mesh = mesh_lib.make_mesh()
    loss = get_loss("CrossEntropyLoss")

    for model_name, frame_level, batch, overrides in CASES:
        hp = ModelHParams(**overrides)
        model = get_model(model_name, hp)
        rng = np.random.default_rng(0)
        if frame_level:
            feats = rng.integers(
                0, 256, size=(batch, 300, 1152), dtype=np.uint8
            )
        else:
            feats = rng.normal(size=(batch, 1152)).astype(np.float32)
        batch_np = {
            "features": feats,
            "labels": (rng.random((batch, 4716)) < 0.002).astype(
                np.float32
            ),
            "num_frames": rng.integers(30, 301, size=(batch,)).astype(
                np.int32
            ),
            "batch_mask": np.ones((batch,), np.float32),
        }
        tx = make_optimizer(global_batch_size=batch)
        state = init_train_state(
            model, jax.random.PRNGKey(0), batch_np, tx, frame_level
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

        state, metrics = step_fn(state, device_batch, key)  # compile
        _ = jax.device_get(metrics["loss"])
        steps = 20
        # device_get forces a real sync (axon block_until_ready can
        # return early; see scripts/check_timing_sanity.py).
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step_fn(
                state, device_batch, jax.random.fold_in(key, i)
            )
        _ = jax.device_get(metrics["loss"])
        dt = time.perf_counter() - t0
        vps = batch * steps / dt
        print(
            json.dumps(
                {
                    "metric": f"train_videos_per_sec_per_chip[{model_name}]",
                    "value": round(vps, 1),
                    "unit": "videos/sec/chip",
                    "step_ms": round(1000 * dt / steps, 1),
                    "batch": batch,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
