"""Multi-host smoke test (SURVEY.md §2.4 "DP multi host").

Spawns TWO real processes, each exposing 2 virtual CPU devices, wires
them with jax.distributed via yt8m_tpu.parallel.distributed
.maybe_initialize (the env contract the CLIs use), and drives the real
multi-host data path: per-host file shards -> per-host batch slice ->
make_array_from_process_local_data -> one SPMD train step over the
4-device global mesh. Asserts both processes agree on the loss and
that it matches a single-process oracle over the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; data_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:" + port
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
sys.path.insert(0, %(repo)r)

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from yt8m_tpu.parallel.distributed import maybe_initialize, per_host_batch
assert maybe_initialize(), "env contract not picked up"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

# --- per-host file shards: each process reads a disjoint subset -------
from yt8m_tpu.data.tfrecord import glob_files, shard_files
from yt8m_tpu.data.pipeline import make_batch_iterator
from yt8m_tpu.data.readers import ReaderConfig

files = shard_files(glob_files(data_dir + "/train-*.tfrecord"), pid, 2)
assert files, "process got no file shard"
rc = ReaderConfig(
    feature_names="mean_rgb,mean_audio", feature_sizes="12,4",
    frame_features=False, num_classes=8,
)
n_local = 0
for b in make_batch_iterator(files, rc, batch_size=8, shuffle=False,
                             num_epochs=1, pad_final_batch=True):
    n_local += int(b["batch_mask"].sum())
print("LOCALVIDEOS", pid, n_local, flush=True)

# --- SPMD step over a deterministic global batch ----------------------
from yt8m_tpu.models import ModelHParams, get_model
from yt8m_tpu.parallel import mesh as mesh_lib
from yt8m_tpu.train.losses import get_loss
from yt8m_tpu.train.state import init_train_state, make_optimizer
from yt8m_tpu.train.step import make_train_step

GB = 16
hb = per_host_batch(GB)
assert hb == 8
rng = np.random.default_rng(0)
gbatch = {
    "features": rng.normal(size=(GB, 16)).astype(np.float32),
    "labels": (rng.random((GB, 8)) < 0.3).astype(np.float32),
    "num_frames": np.ones((GB,), np.int32),
    "batch_mask": np.ones((GB,), np.float32),
}
local = {k: v[pid * hb:(pid + 1) * hb] for k, v in gbatch.items()}

hp = ModelHParams(vocab_size=8, feature_dim=16, compute_dtype="float32")
model = get_model("LogisticModel", hp)
tx = make_optimizer(global_batch_size=GB)
state = init_train_state(model, jax.random.PRNGKey(0), local, tx, False)
mesh = mesh_lib.make_mesh()
state = jax.device_put(
    state,
    jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state),
)
step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
losses = []
for i in range(3):
    db = mesh_lib.shard_batch(local, mesh)
    state, metrics = step_fn(state, db, jax.random.PRNGKey(7))
    losses.append(float(jax.device_get(metrics["loss"])))
print("LOSSES", pid, " ".join("%%.8f" %% l for l in losses), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_training(tmp_path):
    from yt8m_tpu.data.synthetic import write_dataset

    data_dir = str(tmp_path / "data")
    write_dataset(
        data_dir, "train", num_shards=2, videos_per_shard=24,
        frame_level=False, num_classes=8, seed=4, rgb_dim=12, audio_dim=4,
    )

    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    port = str(_free_port())

    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port, data_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    # each process read a DISJOINT half of the files
    local_counts = {}
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOCALVIDEOS"):
                _, pid, n = line.split()
                local_counts[int(pid)] = int(n)
            if line.startswith("LOSSES"):
                parts = line.split()
                losses[int(parts[1])] = [float(x) for x in parts[2:]]
    assert local_counts == {0: 24, 1: 24}, local_counts
    assert set(losses) == {0, 1}
    # both processes computed the same global loss trajectory
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process oracle over the same global batch
    import jax

    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    GB = 16
    rng = np.random.default_rng(0)
    gbatch = {
        "features": rng.normal(size=(GB, 16)).astype(np.float32),
        "labels": (rng.random((GB, 8)) < 0.3).astype(np.float32),
        "num_frames": np.ones((GB,), np.int32),
        "batch_mask": np.ones((GB,), np.float32),
    }
    hp = ModelHParams(vocab_size=8, feature_dim=16, compute_dtype="float32")
    model = get_model("LogisticModel", hp)
    tx = make_optimizer(global_batch_size=GB)
    state = init_train_state(
        model, jax.random.PRNGKey(0), gbatch, tx, False
    )
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    oracle = []
    for i in range(3):
        state, metrics = step_fn(state, gbatch, jax.random.PRNGKey(7))
        oracle.append(float(jax.device_get(metrics["loss"])))
    np.testing.assert_allclose(losses[0], oracle, rtol=1e-5)
