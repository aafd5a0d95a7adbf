"""Multi-device serving/eval runs MANUAL (shard_map) — required on real
TPU meshes because GSPMD cannot partition Mosaic kernels: a multi-device
jit containing one raises NotImplementedError at lowering
(jax/_src/tpu_custom_call.py :: _tpu_custom_call_lowering, "Please wrap
the call in a shard_map"). The crash itself is TPU-only (interpret-mode
Pallas lowers to plain HLO), so these tests validate the WRAPPER on the
virtual 8-device CPU mesh with the kernels forced through interpret
mode inside shard_map: outputs must match the unwrapped step exactly —
per-video math shards embarrassingly, and the two cross-batch reduces
(class_positives, nonfinite_predictions) psum back to the global
totals."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yt8m_tpu.models import ModelHParams, get_model  # noqa: E402
from yt8m_tpu.parallel import mesh as mesh_lib  # noqa: E402
from yt8m_tpu.train import losses as losses_lib  # noqa: E402
from yt8m_tpu.train.state import (  # noqa: E402
    init_train_state,
    make_optimizer,
)
from yt8m_tpu.train.step import (  # noqa: E402
    make_sparse_eval_step,
    make_topk_predict_step,
)

HP = ModelHParams(
    vocab_size=24, feature_dim=16, max_frames=10,
    nextvlad_groups=4, nextvlad_expansion=2, nextvlad_cluster_size=12,
    nextvlad_hidden_size=16, moe_num_mixtures=2,
)
B = 16


def _setup(mesh):
    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.integers(
            0, 256, size=(B, 10, 16), dtype=np.uint8
        ),
        "labels": (rng.random((B, 24)) < 0.15).astype(np.float32),
        "num_frames": rng.integers(1, 11, size=(B,)).astype(np.int32),
        "batch_mask": np.concatenate(
            [np.ones(B - 3, np.float32), np.zeros(3, np.float32)]
        ),
    }
    model = get_model("NeXtVladModel", HP)
    tx = make_optimizer(global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch_np, tx, frame_level=True
    )
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(
            lambda _: mesh_lib.replicated(mesh), state
        ),
    )
    batch = mesh_lib.shard_batch(batch_np, mesh)
    return model, state, batch


def test_topk_step_shard_map_matches_plain(monkeypatch):
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    mesh = mesh_lib.make_mesh(8)
    model, state, batch = _setup(mesh)
    key = jax.random.PRNGKey(2)

    plain = make_topk_predict_step(model, 5)(state, batch, key)
    manual = make_topk_predict_step(model, 5, mesh=mesh)(
        state, batch, key
    )
    np.testing.assert_array_equal(
        np.asarray(plain[0]), np.asarray(manual[0])
    )
    np.testing.assert_array_equal(
        np.asarray(plain[1]), np.asarray(manual[1])
    )


def test_topk_step_shard_map_with_model_axis(monkeypatch):
    """tp>1 mesh: the batch replicates across 'model'; outputs must be
    identical (per-video compute is deterministic per shard)."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    model, state, batch = _setup(mesh)
    key = jax.random.PRNGKey(2)
    plain = make_topk_predict_step(model, 5)(state, batch, key)
    manual = make_topk_predict_step(model, 5, mesh=mesh)(
        state, batch, key
    )
    np.testing.assert_array_equal(
        np.asarray(plain[0]), np.asarray(manual[0])
    )
    np.testing.assert_array_equal(
        np.asarray(plain[1]), np.asarray(manual[1])
    )


def test_sparse_eval_step_shard_map_matches_plain(monkeypatch):
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    mesh = mesh_lib.make_mesh(8)
    model, state, batch = _setup(mesh)
    loss_obj = losses_lib.get_loss("CrossEntropyLoss")
    key = jax.random.PRNGKey(3)

    plain = jax.device_get(
        make_sparse_eval_step(model, loss_obj, 8)(state, batch, key)
    )
    manual = jax.device_get(
        make_sparse_eval_step(model, loss_obj, 8, mesh=mesh)(
            state, batch, key
        )
    )
    assert set(plain) == set(manual)
    for k in plain:
        np.testing.assert_array_equal(
            np.asarray(plain[k]), np.asarray(manual[k]), err_msg=k
        )
    # the psum'd leaves really are global totals, not one shard's
    assert int(manual["class_positives"].sum()) == int(
        ((np.asarray(jax.device_get(batch["labels"])) > 0)
         & (np.asarray(
             jax.device_get(batch["batch_mask"])) > 0)[:, None]).sum()
    )
