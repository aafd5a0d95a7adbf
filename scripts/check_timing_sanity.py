#!/usr/bin/env python
"""Verify step timing scales linearly with step count (guards against
async-dispatch artifacts on the experimental axon platform)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from yt8m_tpu.models import ModelHParams, get_model  # noqa: E402
from yt8m_tpu.parallel import mesh as mesh_lib  # noqa: E402
from yt8m_tpu.train.losses import get_loss  # noqa: E402
from yt8m_tpu.train.state import (  # noqa: E402
    init_train_state,
    make_optimizer,
)
from yt8m_tpu.train.step import make_train_step  # noqa: E402


def main():
    batch = 4096
    hp = ModelHParams()
    model = get_model("MoeModel", hp)
    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.normal(size=(batch, 1152)).astype(np.float32),
        "labels": (rng.random((batch, 4716)) < 0.002).astype(np.float32),
        "num_frames": np.ones((batch,), np.int32),
        "batch_mask": np.ones((batch,), np.float32),
    }
    mesh = mesh_lib.make_mesh()
    tx = make_optimizer(global_batch_size=batch)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch_np, tx, False
    )
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state),
    )
    db = mesh_lib.shard_batch(batch_np, mesh)
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    key = jax.random.PRNGKey(1)
    state, m = step_fn(state, db, key)
    jax.block_until_ready(m["loss"])

    for steps in (5, 20, 80):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step_fn(state, db, jax.random.fold_in(key, i))
        loss = float(jax.device_get(m["loss"]))  # device_get forces sync
        dt = time.perf_counter() - t0
        print(
            f"steps={steps}: total {dt*1e3:.1f}ms "
            f"per-step {dt/steps*1e3:.2f}ms loss={loss:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
