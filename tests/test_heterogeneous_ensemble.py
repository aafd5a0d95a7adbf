"""Heterogeneous on-device ensemble serving (r2 VERDICT item #6).

The fork's ensembles mixed model families with different hparams
(SURVEY.md §3.5). Each trained run now records model_flags.json
(reference train.py behavior); build_ensemble rebuilds every member
from its OWN file — so a DBoF and a NetVLAD with different cluster
sizes serve together in one jit, and the device average must equal the
host-side average of the members' dense dumps.
"""

import json
import os

import numpy as np
import pytest

from yt8m_tpu.config import InferenceConfig, TrainConfig
from yt8m_tpu.data.synthetic import write_dataset
from yt8m_tpu.infer.predict import inference
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.loop import Trainer

C = 12
D = 12  # 8 rgb + 4 audio
F = 16  # max frames

MEMBERS = [
    # (model, member-specific hparams) — genuinely different families
    # AND different aggregation hparams per member.
    ("DbofModel", dict(dbof_cluster_size=16, dbof_hidden_size=8)),
    ("GatedNetVladModel", dict(netvlad_cluster_size=4,
                               netvlad_hidden_size=8)),
]


def _hp(**kw):
    return ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=F,
        compute_dtype="float32", iterations=8, **kw,
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("het_ens")
    data = str(root / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=24,
        frame_level=True, num_classes=C, seed=31, rgb_dim=8, audio_dim=4,
        max_frames=F,
    )
    dirs, dumps = [], []
    for i, (model, hp_kw) in enumerate(MEMBERS):
        train_dir = str(root / f"member{i}")
        Trainer(
            TrainConfig(
                train_data_pattern=os.path.join(data, "train-*.tfrecord"),
                feature_names="rgb,audio",
                feature_sizes="8,4",
                frame_features=True,
                num_classes=C,
                max_frames=F,
                batch_size=8,
                num_epochs=20,
                max_steps=8,
                model=model,
                train_dir=train_dir,
                save_checkpoint_every_n_steps=8,
                log_every_n_steps=1000,
                hparams=_hp(**hp_kw),
            )
        ).run()
        dump_dir = str(root / f"dump{i}")
        inference(
            InferenceConfig(
                input_data_pattern=os.path.join(data, "train-*.tfrecord"),
                feature_names="rgb,audio",
                feature_sizes="8,4",
                frame_features=True,
                num_classes=C,
                max_frames=F,
                batch_size=8,
                model=model,
                train_dir=train_dir,
                output_probabilities_dir=dump_dir,
                hparams=_hp(**hp_kw),
            )
        )
        dirs.append(train_dir)
        dumps.append(dump_dir)
    return str(root), data, dirs, dumps


def test_model_flags_json_written(setup):
    """Every trained run is self-describing (reference train.py wrote
    model_flags.json into train_dir)."""
    _, _, dirs, _ = setup
    for (model, hp_kw), d in zip(MEMBERS, dirs):
        path = os.path.join(d, "model_flags.json")
        assert os.path.exists(path)
        data = json.load(open(path))
        assert data["model"] == model
        assert data["frame_features"] is True
        for k, v in hp_kw.items():
            assert data["hparams"][k] == v


def test_heterogeneous_device_ensemble_matches_host_average(
    setup, tmp_path
):
    """DBoF + GatedNetVLAD (different families, different cluster sizes)
    served in ONE jit via per-member model_flags.json — NO
    --ensemble_models and no member hparams in the run config — must
    reproduce the host-side average of the members' dense dumps."""
    from yt8m_tpu.ensemble.average import (
        align_members,
        load_prediction_dir,
        weighted_average,
    )

    root, data, dirs, dumps = setup
    out_dir = str(tmp_path / "het_probs")
    inference(
        InferenceConfig(
            input_data_pattern=os.path.join(data, "train-*.tfrecord"),
            feature_names="rgb,audio",
            feature_sizes="8,4",
            frame_features=True,
            num_classes=C,
            max_frames=F,
            batch_size=8,
            # run-config model/hparams are NOT the members': resolution
            # must come from each member's model_flags.json.
            model="FrameLevelLogisticModel",
            ensemble_train_dirs=",".join(dirs),
            ensemble_weights="0.6,0.4",
            output_probabilities_dir=out_dir,
            hparams=_hp(),
        )
    )
    ids_e, ens = load_prediction_dir(out_dir)
    ids, aligned = align_members([load_prediction_dir(d) for d in dumps])
    want = weighted_average(aligned, [0.6, 0.4])
    order = [ids.index(v) for v in ids_e]
    np.testing.assert_allclose(ens, want[order], atol=1e-5)


def test_input_contract_mismatch_rejected(setup, tmp_path):
    """A member whose recorded feature layout disagrees with the run's
    must be rejected loudly, not silently mis-served."""
    from yt8m_tpu.infer.ensemble_serve import build_ensemble

    root, _, dirs, _ = setup
    bad_dir = str(tmp_path / "bad_member")
    os.makedirs(bad_dir)
    flags = json.load(open(os.path.join(dirs[0], "model_flags.json")))
    flags["hparams"]["feature_dim"] = D * 2
    json.dump(flags, open(os.path.join(bad_dir, "model_flags.json"), "w"))
    cfg = InferenceConfig(
        feature_names="rgb,audio",
        feature_sizes="8,4",
        frame_features=True,
        num_classes=C,
        max_frames=F,
        model="FrameLevelLogisticModel",
        ensemble_train_dirs=",".join([dirs[0], bad_dir]),
        hparams=_hp(),
    )
    with pytest.raises(SystemExit, match="feature_dim"):
        build_ensemble(cfg)


def test_runtime_flags_stay_under_cli_control(setup):
    """A member's model_flags.json supplies STRUCTURAL hparams only —
    serving-time/runtime knobs (compute_dtype, kernel/int8 toggles)
    come from the serve-time CLI, not the recorded train-time config."""
    from yt8m_tpu.infer.ensemble_serve import build_ensemble

    _, _, dirs, _ = setup
    cfg = InferenceConfig(
        feature_names="rgb,audio",
        feature_sizes="8,4",
        frame_features=True,
        num_classes=C,
        max_frames=F,
        ensemble_train_dirs=",".join(dirs),
        # members trained with compute_dtype=float32 recorded in
        # model_flags.json; the serve-time CLI asks for bfloat16.
        hparams=ModelHParams(
            vocab_size=C, feature_dim=D, max_frames=F,
            compute_dtype="bfloat16", iterations=8,
            dbof_int8_serving=True,
        ),
    )
    ens = build_ensemble(cfg)
    for m, (_, hp_kw) in zip(ens.models, MEMBERS):
        # runtime knobs: CLI wins
        assert m.hp.compute_dtype == "bfloat16"
        assert m.hp.dbof_int8_serving is True
        # structural knobs: recorded member config wins
        for k, v in hp_kw.items():
            assert getattr(m.hp, k) == v
