"""Frame-level end-to-end: DBoF on synthetic SequenceExamples, plus a
distillation student run consuming teacher predictions."""

import os

import pytest

from yt8m_tpu.config import EvalConfig, TrainConfig
from yt8m_tpu.data.synthetic import write_dataset
from yt8m_tpu.eval.loop import evaluate_checkpoint
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.loop import Trainer

C = 16
HP = ModelHParams(
    compute_dtype="float32",
    dbof_cluster_size=64,
    dbof_hidden_size=32,
    iterations=8,
    moe_num_mixtures=2,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("yt8m_frames")
    write_dataset(
        str(root), "train", num_shards=2, videos_per_shard=32,
        frame_level=True, num_classes=C, seed=3,
        rgb_dim=24, audio_dim=8, max_frames=20, min_frames=4,
    )
    write_dataset(
        str(root), "validate", num_shards=1, videos_per_shard=32,
        frame_level=True, num_classes=C, seed=11,
        rgb_dim=24, audio_dim=8, max_frames=20, min_frames=4,
    )
    return str(root)


def test_dbof_frame_training(dataset, tmp_path):
    train_dir = str(tmp_path / "dbof")
    cfg = TrainConfig(
        train_data_pattern=os.path.join(dataset, "train-*.tfrecord"),
        feature_names="rgb,audio",
        feature_sizes="24,8",
        frame_features=True,
        num_classes=C,
        max_frames=20,
        batch_size=16,
        num_epochs=40,
        max_steps=50,
        model="DbofModel",
        base_learning_rate=0.02,
        learning_rate_decay_examples=100000,
        train_dir=train_dir,
        save_checkpoint_every_n_steps=50,
        log_every_n_steps=25,
        hparams=HP,
    )
    assert Trainer(cfg).run() == 50

    out = evaluate_checkpoint(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="rgb,audio",
            feature_sizes="24,8",
            frame_features=True,
            num_classes=C,
            max_frames=20,
            batch_size=16,
            model="DbofModel",
            train_dir=train_dir,
            hparams=HP,
        )
    )
    assert out["gap"] > 0.2, out


def test_distillation_student(dataset, tmp_path):
    """Student trains on alpha*CE(labels) + (1-alpha)*CE(teacher)."""
    from yt8m_tpu.ensemble.distill import write_distill_dataset

    # Fabricate a teacher that's mildly informative: labels smoothed.
    from yt8m_tpu.ensemble.average import labels_from_tfrecords

    labels = labels_from_tfrecords(
        os.path.join(dataset, "train-*.tfrecord"), True, C
    )
    teacher = {
        vid: 0.8 * dense + 0.1 for vid, dense in labels.items()
    }
    distill_dir = str(tmp_path / "distilled")
    n = write_distill_dataset(
        os.path.join(dataset, "train-*.tfrecord"),
        teacher,
        distill_dir,
        frame_level=True,
    )
    assert n == 64

    train_dir = str(tmp_path / "student")
    cfg = TrainConfig(
        train_data_pattern=os.path.join(distill_dir, "train-*.tfrecord"),
        distill_data_pattern="teacher",  # enables the reader teacher input
        feature_names="rgb,audio",
        feature_sizes="24,8",
        frame_features=True,
        num_classes=C,
        max_frames=20,
        batch_size=16,
        num_epochs=20,
        max_steps=20,
        model="FrameLevelLogisticModel",
        label_loss="MixedCrossEntropyDistillLoss",
        base_learning_rate=0.05,
        train_dir=train_dir,
        save_checkpoint_every_n_steps=20,
        hparams=ModelHParams(compute_dtype="float32"),
    )
    # ReaderConfig.distill_dim defaults to 4716; override through iterator.
    from yt8m_tpu.data.pipeline import make_batch_iterator
    from yt8m_tpu.train.loop import reader_config_from

    rc = reader_config_from(cfg)
    rc.distill_dim = C
    it = make_batch_iterator(
        cfg.train_data_pattern, rc, batch_size=cfg.batch_size,
        shuffle=True, num_epochs=cfg.num_epochs, seed=0,
    )
    # verify teacher reaches batches, then train with it
    first = next(iter(it))
    assert "teacher" in first and first["teacher"].shape == (16, C)
    assert Trainer(cfg, data_iterator=it).run() == 20


def test_netvlad_lstm_flagship_training(dataset, tmp_path):
    """North-star flagship: NetVLAD-LSTM trains end-to-end and beats
    chance GAP on the planted-signal synthetic data."""
    hp = ModelHParams(
        compute_dtype="float32",
        netvlad_cluster_size=8,
        netvlad_hidden_size=16,
        lstm_cells=16,
        lstm_layers=1,
        moe_num_mixtures=2,
    )
    train_dir = str(tmp_path / "nvlstm")
    cfg = TrainConfig(
        train_data_pattern=os.path.join(dataset, "train-*.tfrecord"),
        feature_names="rgb,audio",
        feature_sizes="24,8",
        frame_features=True,
        num_classes=C,
        max_frames=20,
        batch_size=16,
        num_epochs=40,
        max_steps=50,
        model="NetVladLstmModel",
        base_learning_rate=0.02,
        learning_rate_decay_examples=100000,
        train_dir=train_dir,
        save_checkpoint_every_n_steps=50,
        log_every_n_steps=25,
        hparams=hp,
    )
    assert Trainer(cfg).run() == 50

    out = evaluate_checkpoint(
        EvalConfig(
            eval_data_pattern=os.path.join(dataset, "validate-*.tfrecord"),
            feature_names="rgb,audio",
            feature_sizes="24,8",
            frame_features=True,
            num_classes=C,
            max_frames=20,
            batch_size=16,
            model="NetVladLstmModel",
            train_dir=train_dir,
            hparams=hp,
        )
    )
    assert out["gap"] > 0.2, out
