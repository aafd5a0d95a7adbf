"""Full ensemble flow: two trained members -> pre-ensemble dumps ->
CLI weight fit on validate GAP -> averaged CSV (reference fork flow,
SURVEY.md §3.5)."""

import os

import pytest

from yt8m_tpu.cli import ensemble as ensemble_cli
from yt8m_tpu.config import InferenceConfig, TrainConfig
from yt8m_tpu.data.synthetic import write_dataset
from yt8m_tpu.infer.predict import inference
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.loop import Trainer

C = 14
HP = ModelHParams(compute_dtype="float32", moe_num_mixtures=2)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ens_e2e")
    data = str(root / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=48,
        frame_level=False, num_classes=C, seed=21, rgb_dim=16, audio_dim=4,
    )
    write_dataset(
        data, "validate", num_shards=1, videos_per_shard=32,
        frame_level=False, num_classes=C, seed=22, rgb_dim=16, audio_dim=4,
    )
    members = []
    for i, model in enumerate(["MoeModel", "LogisticModel"]):
        train_dir = str(root / f"member{i}")
        Trainer(
            TrainConfig(
                train_data_pattern=os.path.join(data, "train-*.tfrecord"),
                feature_names="mean_rgb,mean_audio",
                feature_sizes="16,4",
                num_classes=C,
                batch_size=16,
                num_epochs=30,
                max_steps=30,
                model=model,
                base_learning_rate=0.02,
                train_dir=train_dir,
                save_checkpoint_every_n_steps=30,
                log_every_n_steps=1000,
                hparams=HP,
            )
        ).run()
        pred_dir = str(root / f"preds{i}")
        inference(
            InferenceConfig(
                input_data_pattern=os.path.join(
                    data, "validate-*.tfrecord"
                ),
                feature_names="mean_rgb,mean_audio",
                feature_sizes="16,4",
                num_classes=C,
                batch_size=16,
                model=model,
                train_dir=train_dir,
                output_probabilities_dir=pred_dir,
                hparams=HP,
            )
        )
        members.append(pred_dir)
    return str(root), data, members


def test_cli_ensemble_fit_and_csv(setup, capsys):
    root, data, members = setup
    out_csv = os.path.join(root, "ensemble.csv")
    ensemble_cli.main(
        [
            f"--member_dirs={','.join(members)}",
            "--fit_weights",
            f"--eval_labels_pattern={data}/validate-*.tfrecord",
            f"--num_classes={C}",
            f"--output_file={out_csv}",
            "--top_k=5",
        ]
    )
    printed = capsys.readouterr().out
    assert "GAP" in printed
    gap = float(printed.strip().split()[-1])
    assert gap > 0.3  # planted signal: well above chance
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert len(lines) == 33


def test_sparse_topk_dump_matches_dense(setup):
    """--output_probabilities_topk dumps sparse top-N chunks that densify
    to the dense dump's values at the tracked positions (zeros elsewhere,
    fork pre-ensemble storage semantics)."""
    import numpy as np

    from yt8m_tpu.ensemble.average import load_prediction_dir

    root, data, members = setup
    sparse_dir = os.path.join(root, "preds0_sparse")
    inference(
        InferenceConfig(
            input_data_pattern=os.path.join(data, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio",
            feature_sizes="16,4",
            num_classes=C,
            batch_size=16,
            model="MoeModel",
            train_dir=os.path.join(root, "member0"),
            output_probabilities_dir=sparse_dir,
            output_probabilities_topk=5,
            hparams=HP,
        )
    )
    ids_d, dense = load_prediction_dir(members[0])
    ids_s, sparse = load_prediction_dir(sparse_dir)
    assert ids_d == ids_s
    assert sparse.shape == dense.shape
    nz = sparse > 0
    assert nz.sum(axis=1).max() <= 5
    np.testing.assert_allclose(sparse[nz], dense[nz], rtol=1e-6)
    # every row's top-5 of the dense dump is exactly the sparse support
    top5 = np.argsort(-dense, axis=1, kind="stable")[:, :5]
    for r in range(dense.shape[0]):
        kept = set(np.flatnonzero(nz[r]).tolist())
        assert kept <= set(top5[r].tolist()) or len(kept) < 5


def test_checkpoint_ensembling(setup):
    from yt8m_tpu.ensemble.checkpoints import (
        ensemble_checkpoint_predictions,
    )

    root, data, _ = setup
    cfg = InferenceConfig(
        input_data_pattern=os.path.join(data, "validate-*.tfrecord"),
        feature_names="mean_rgb,mean_audio",
        feature_sizes="16,4",
        num_classes=C,
        batch_size=16,
        model="MoeModel",
        train_dir=os.path.join(root, "member0"),
        hparams=HP,
    )
    out_csv = os.path.join(root, "ckpt_ens.csv")
    ids, avg = ensemble_checkpoint_predictions(
        cfg, last_n=1, output_csv=out_csv
    )
    assert len(ids) == 32 and avg.shape == (32, C)
    assert os.path.exists(out_csv)


def test_on_device_ensemble_serving_matches_host_average(setup, tmp_path):
    """--ensemble_train_dirs serves N members in ONE jit (device-side
    weighted average) and must reproduce the host-side average of the
    members' dense dumps exactly."""
    import numpy as np

    from yt8m_tpu.ensemble.average import (
        align_members,
        load_prediction_dir,
        weighted_average,
    )

    root, data, members = setup
    out_dir = str(tmp_path / "ens_probs")
    inference(
        InferenceConfig(
            input_data_pattern=os.path.join(data, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio",
            feature_sizes="16,4",
            num_classes=C,
            batch_size=16,
            model="MoeModel",
            ensemble_train_dirs=",".join(
                [os.path.join(root, "member0"), os.path.join(root, "member1")]
            ),
            ensemble_models="MoeModel,LogisticModel",
            ensemble_weights="0.7,0.3",
            output_probabilities_dir=out_dir,
            hparams=HP,
        )
    )
    ids_e, ens = load_prediction_dir(out_dir)
    ids, aligned = align_members(
        [load_prediction_dir(d) for d in members]
    )
    want = weighted_average(aligned, [0.7, 0.3])
    order = [ids.index(v) for v in ids_e]
    np.testing.assert_allclose(ens, want[order], atol=1e-6)


def test_direct_ensemble_eval_matches_dump_average_gap(setup):
    """eval.py --ensemble_train_dirs computes the ensemble's GAP directly
    (device-side average) == GAP of the host-averaged member dumps."""
    import numpy as np

    from yt8m_tpu.config import EvalConfig
    from yt8m_tpu.ensemble.average import (
        align_members,
        labels_from_tfrecords,
        load_prediction_dir,
        weighted_average,
    )
    from yt8m_tpu.eval.loop import evaluate_checkpoint
    from yt8m_tpu.metrics import calculate_gap

    root, data, members = setup
    out = evaluate_checkpoint(
        EvalConfig(
            eval_data_pattern=os.path.join(data, "validate-*.tfrecord"),
            feature_names="mean_rgb,mean_audio",
            feature_sizes="16,4",
            num_classes=C,
            batch_size=16,
            model="MoeModel",
            ensemble_train_dirs=",".join(
                [os.path.join(root, "member0"), os.path.join(root, "member1")]
            ),
            ensemble_models="MoeModel,LogisticModel",
            hparams=HP,
        )
    )
    ids, aligned = align_members([load_prediction_dir(d) for d in members])
    avg = weighted_average(aligned)
    label_map = labels_from_tfrecords(
        os.path.join(data, "validate-*.tfrecord"), False, C
    )
    labels = np.stack([label_map[v] for v in ids])
    want = calculate_gap(avg, labels, top_k=20)
    assert out["gap"] == pytest.approx(want, abs=1e-9)
