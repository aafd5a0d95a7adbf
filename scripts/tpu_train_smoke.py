#!/usr/bin/env python
"""On-chip training smoke: LstmModel (custom-VJP Pallas recurrence) on
synthetic frame data must drive the loss down. Complements the CPU e2e
tests, which exercise the scan path."""

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
    batch, classes = 256, 4716
    hp = ModelHParams(lstm_cells=1024, lstm_layers=2)
    model = get_model("LstmModel", hp)
    rng = np.random.default_rng(0)
    # Learnable signal: labels derived from mean feature intensity.
    feats = rng.integers(0, 256, size=(batch, 300, 1152), dtype=np.uint8)
    sig = feats[:, :, :64].mean(axis=(1, 2))
    labels = np.zeros((batch, classes), np.float32)
    labels[np.arange(batch), (sig * 40).astype(int) % classes] = 1.0
    batch_np = {
        "features": feats,
        "labels": labels,
        "num_frames": rng.integers(30, 301, size=(batch,)).astype(
            np.int32
        ),
        "batch_mask": np.ones((batch,), np.float32),
    }
    mesh = mesh_lib.make_mesh()
    tx = make_optimizer(global_batch_size=batch, base_learning_rate=0.001)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch_np, tx, True
    )
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state),
    )
    db = mesh_lib.shard_batch(batch_np, mesh)
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    key = jax.random.PRNGKey(1)

    losses = []
    t0 = time.time()
    for i in range(30):
        state, m = step_fn(state, db, jax.random.fold_in(key, i))
        if i in (0, 9, 19, 29):
            losses.append(float(jax.device_get(m["loss"])))
            print(f"step {i}: loss {losses[-1]:.4f}", flush=True)
    print(f"30 steps in {time.time()-t0:.1f}s", flush=True)
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses[-1])
    print("TPU LSTM TRAINING OK (loss decreased with fused-VJP kernel)",
          flush=True)


if __name__ == "__main__":
    main()
