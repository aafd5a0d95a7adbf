"""Reference-compatible CLI flag surface + micro runs through main()."""

import os

import pytest

from yt8m_tpu.config import TrainConfig
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.utils.flags import parse_into


def test_train_flags_parse_reference_names():
    cfg, _ = parse_into(
        TrainConfig,
        [
            "--train_data_pattern=/tmp/x*.tfrecord",
            "--feature_names=rgb,audio",
            "--feature_sizes=1024,128",
            "--frame_features=True",
            "--model=DbofModel",
            "--label_loss=CrossEntropyLoss",
            "--batch_size=256",
            "--base_learning_rate=0.002",
            "--moe_num_mixtures=8",
            "--dbof_cluster_size=2048",
            "--lstm_cells=512",
            "--iterations=60",
            "--sample_random_frames=False",
            "--start_new_model",
        ],
        hparams_cls=ModelHParams,
    )
    assert cfg.frame_features is True
    assert cfg.model == "DbofModel"
    assert cfg.batch_size == 256
    assert cfg.start_new_model is True
    assert cfg.hparams.moe_num_mixtures == 8
    assert cfg.hparams.dbof_cluster_size == 2048
    assert cfg.hparams.lstm_cells == 512
    assert cfg.hparams.iterations == 60
    assert cfg.hparams.sample_random_frames is False
    hp = cfg.resolved_hparams()
    assert hp.vocab_size == 4716 and hp.max_frames == 300


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit):
        parse_into(
            TrainConfig, ["--definitely_not_a_flag=1"],
            hparams_cls=ModelHParams,
        )


def test_cli_train_eval_infer_micro(tmp_path):
    """Full CLI path: python train.py/eval.py/inference.py argv surface."""
    from yt8m_tpu.cli import eval as eval_cli
    from yt8m_tpu.cli import inference as infer_cli
    from yt8m_tpu.cli import train as train_cli
    from yt8m_tpu.data.synthetic import write_dataset

    data = str(tmp_path / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=24,
        frame_level=False, num_classes=10, seed=0, rgb_dim=16, audio_dim=4,
    )
    train_dir = str(tmp_path / "run")
    common = [
        "--feature_names=mean_rgb,mean_audio",
        "--feature_sizes=16,4",
        "--num_classes=10",
        "--batch_size=8",
        "--model=LogisticModel",
        f"--train_dir={train_dir}",
    ]
    train_cli.main(
        [
            f"--train_data_pattern={data}/train-*.tfrecord",
            "--max_steps=6",
            "--num_epochs=10",
            "--save_checkpoint_every_n_steps=6",
            "--log_every_n_steps=3",
            "--compute_dtype=float32",
        ]
        + common
    )
    assert os.path.isdir(train_dir)

    eval_cli.main(
        [
            f"--eval_data_pattern={data}/train-*.tfrecord",
            "--run_once=True",
            "--compute_dtype=float32",
        ]
        + common
    )

    out_csv = str(tmp_path / "out.csv")
    infer_cli.main(
        [
            f"--input_data_pattern={data}/train-*.tfrecord",
            f"--output_file={out_csv}",
            "--top_k=3",
            "--compute_dtype=float32",
        ]
        + common
    )
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert len(lines) == 25


def test_cli_eval_infer_rebuild_from_model_flags(tmp_path):
    """Reference eval.py/inference.py semantics: a run is
    self-describing — eval/inference with ONLY the data pattern and
    --train_dir rebuild the model/reader config from the recorded
    model_flags.json; explicitly-typed flags still win."""
    from yt8m_tpu.cli import eval as eval_cli
    from yt8m_tpu.cli import inference as infer_cli
    from yt8m_tpu.cli import train as train_cli
    from yt8m_tpu.data.synthetic import write_dataset

    data = str(tmp_path / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=16,
        frame_level=False, num_classes=10, seed=0, rgb_dim=16, audio_dim=4,
    )
    train_dir = str(tmp_path / "run")
    train_cli.main(
        [
            f"--train_data_pattern={data}/train-*.tfrecord",
            f"--train_dir={train_dir}",
            "--feature_names=mean_rgb,mean_audio",
            "--feature_sizes=16,4",
            "--num_classes=10",
            "--batch_size=8",
            "--model=MoeModel",
            "--moe_num_mixtures=3",
            "--max_steps=4",
            "--num_epochs=10",
            "--save_checkpoint_every_n_steps=4",
            "--compute_dtype=float32",
        ]
    )
    assert os.path.isfile(os.path.join(train_dir, "model_flags.json"))

    # NO model/feature flags: both CLIs must rebuild MoeModel(mixtures=3)
    # with the 20-dim reader from the recording — this exact invocation
    # crashed with a restore-tree mismatch before the rebuild existed.
    eval_cli.main(
        [
            f"--eval_data_pattern={data}/train-*.tfrecord",
            f"--train_dir={train_dir}",
            "--run_once=True",
            "--batch_size=8",
            "--compute_dtype=float32",
        ]
    )
    out_csv = str(tmp_path / "out.csv")
    infer_cli.main(
        [
            f"--input_data_pattern={data}/train-*.tfrecord",
            f"--train_dir={train_dir}",
            f"--output_file={out_csv}",
            "--top_k=3",
            "--batch_size=8",
            "--compute_dtype=float32",
        ]
    )
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert len(lines) == 17

    # explicit flag wins over the recording: a wrong explicit model must
    # fail the restore (tree mismatch), not be silently replaced.
    with pytest.raises(Exception):
        eval_cli.main(
            [
                f"--eval_data_pattern={data}/train-*.tfrecord",
                f"--train_dir={train_dir}",
                "--model=LogisticModel",
                "--feature_names=mean_rgb,mean_audio",
                "--feature_sizes=16,4",
                "--num_classes=10",
                "--run_once=True",
                "--batch_size=8",
                "--compute_dtype=float32",
            ]
        )
