"""Multi-device SPMD correctness on the virtual 8-CPU mesh (SURVEY.md §4):
the 8-way data-parallel train step must match the single-device step, and
the TP-sharded MoE head must match the replicated one."""

import jax
import numpy as np

from yt8m_tpu.models import ModelHParams, get_model
from yt8m_tpu.parallel import mesh as mesh_lib
from yt8m_tpu.train.losses import get_loss
from yt8m_tpu.train.state import init_train_state, make_optimizer
from yt8m_tpu.train.step import make_train_step

C, D = 16, 32


def _batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "features": rng.normal(size=(b, D)).astype(np.float32),
        "labels": (rng.random((b, C)) < 0.2).astype(np.float32),
        "num_frames": np.ones((b,), np.int32),
        "batch_mask": np.ones((b,), np.float32),
    }


def _run_steps(mesh, model_parallel=1, n_steps=3):
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, compute_dtype="float32",
        moe_num_mixtures=2,
    )
    model = get_model("MoeModel", hp)
    tx = make_optimizer(global_batch_size=16, base_learning_rate=0.05)
    state = init_train_state(
        model, jax.random.PRNGKey(0), _batch(), tx, frame_level=False
    )
    shardings = jax.tree_util.tree_map(
        lambda _: mesh_lib.replicated(mesh), state
    )
    shardings = shardings.replace(
        params=mesh_lib.tree_param_shardings(state.params, mesh)
    )
    state = jax.device_put(state, shardings)
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    losses = []
    for i in range(n_steps):
        batch = mesh_lib.shard_batch(_batch(seed=i), mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(42))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, jax.device_get(state.params)


def test_dp8_matches_single_device():
    assert len(jax.devices()) == 8
    losses_1, params_1 = _run_steps(mesh_lib.make_mesh(1))
    losses_8, params_8 = _run_steps(mesh_lib.make_mesh(8))
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        params_1,
        params_8,
    )


def test_tp2_matches_replicated():
    losses_dp, params_dp = _run_steps(mesh_lib.make_mesh(8))
    losses_tp, params_tp = _run_steps(
        mesh_lib.make_mesh(8, model_parallel=2), model_parallel=2
    )
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        params_dp,
        params_tp,
    )


def test_tp_policy_shards_head_kernels():
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    hp = ModelHParams(vocab_size=C, feature_dim=D, compute_dtype="float32")
    model = get_model("MoeModel", hp)
    tx = make_optimizer(global_batch_size=16)
    state = init_train_state(
        model, jax.random.PRNGKey(0), _batch(), tx, frame_level=False
    )
    sh = mesh_lib.tree_param_shardings(state.params, mesh)
    gates_spec = sh["tower"]["gates_kernel"].spec
    assert gates_spec == jax.sharding.PartitionSpec(None, "model")


def test_fsdp_matches_replicated():
    """FSDP-sharded params/opt-state must train identically to replicated
    (GSPMD all-gather on use, reduce-scatter grads)."""
    losses_rep, params_rep = _run_steps(mesh_lib.make_mesh(8))

    hp = ModelHParams(
        vocab_size=C, feature_dim=D, compute_dtype="float32",
        moe_num_mixtures=2,
    )
    model = get_model("MoeModel", hp)
    tx = make_optimizer(global_batch_size=16, base_learning_rate=0.05)
    state = init_train_state(
        model, jax.random.PRNGKey(0), _batch(), tx, frame_level=False
    )
    mesh = mesh_lib.make_mesh(8)
    param_sh = mesh_lib.tree_param_shardings(
        state.params, mesh, fsdp_min_size=64
    )
    # the big head kernels must actually be FSDP-sharded over 'data'
    assert param_sh["tower"]["gates_kernel"].spec == (
        jax.sharding.PartitionSpec("data", None)
    )
    shardings = jax.tree_util.tree_map(
        lambda _: mesh_lib.replicated(mesh), state
    )
    shardings = shardings.replace(
        params=param_sh,
        opt_state=mesh_lib.tree_param_shardings(
            state.opt_state, mesh, fsdp_min_size=64
        ),
    )
    state = jax.device_put(state, shardings)
    step_fn = make_train_step(model, get_loss("CrossEntropyLoss"))
    losses = []
    for i in range(3):
        batch = mesh_lib.shard_batch(_batch(seed=i), mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(42))
        losses.append(float(jax.device_get(metrics["loss"])))
    np.testing.assert_allclose(losses_rep, losses, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        params_rep,
        jax.device_get(state.params),
    )
