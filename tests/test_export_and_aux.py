"""Serving export, checkpoint ensembling, summaries, JSON->CSV converter."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from yt8m_tpu.models import ModelHParams, get_model

C, D = 18, 24
HP = ModelHParams(vocab_size=C, feature_dim=D, compute_dtype="float32")


def _make_variables(model_name="MoeModel"):
    model = get_model(model_name, HP)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, D)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats,
        np.ones((2,), np.int32),
        train=False,
    )
    return model, variables


def test_export_and_reload_serving(tmp_path):
    from yt8m_tpu.infer.export import export_model, load_serving

    _, variables = _make_variables()
    export_dir = str(tmp_path / "export")
    export_model(
        export_dir, "MoeModel", HP, variables["params"],
        batch_size=4, top_k=5,
    )
    serve, meta = load_serving(export_dir)
    assert meta["model"] == "MoeModel" and meta["top_k"] == 5
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(4, D)).astype(np.float32)
    values, indices = serve(feats, np.ones((4,), np.int32))
    values, indices = np.asarray(values), np.asarray(indices)
    assert values.shape == (4, 5) and indices.shape == (4, 5)
    assert np.all(np.diff(values, axis=1) <= 1e-7)  # sorted desc
    # Parity with direct apply
    model, _ = _make_variables()
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.join(export_dir, "variables")
    )
    out = model.apply(
        restored, feats, np.ones((4,), np.int32), train=False,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    top = np.sort(np.asarray(out["predictions"]), axis=1)[:, -5:][:, ::-1]
    np.testing.assert_allclose(values, top, atol=1e-5)


def test_average_checkpoint_weights(tmp_path):
    from yt8m_tpu.train.checkpoint import CheckpointManager
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.ensemble.checkpoints import average_checkpoint_weights

    model, variables = _make_variables()
    rng = np.random.default_rng(2)
    batch = {
        "features": rng.normal(size=(2, D)).astype(np.float32),
        "num_frames": np.ones((2,), np.int32),
    }
    tx = make_optimizer(global_batch_size=2)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch, tx, frame_level=False
    )
    ckpt = CheckpointManager(str(tmp_path / "run"))
    s1 = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    )
    s2 = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 3.0, state.params)
    )
    ckpt.save(1, s1)
    ckpt.save(2, s2)
    ckpt.close()
    avg = average_checkpoint_weights(str(tmp_path / "run"), state, [1, 2])
    expect = jax.tree_util.tree_map(lambda x: x + 2.0, state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        avg.params,
        expect,
    )


def test_trainer_periodic_export(tmp_path):
    """--export_model_steps parity: serving exports written during training."""
    from yt8m_tpu.config import TrainConfig
    from yt8m_tpu.data.synthetic import write_dataset
    from yt8m_tpu.infer.export import load_serving
    from yt8m_tpu.train.loop import Trainer

    data = str(tmp_path / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=16,
        frame_level=False, num_classes=C, seed=5, rgb_dim=D - 4,
        audio_dim=4,
    )
    train_dir = str(tmp_path / "run")
    Trainer(
        TrainConfig(
            train_data_pattern=os.path.join(data, "train-*.tfrecord"),
            feature_names="mean_rgb,mean_audio",
            feature_sizes=f"{D-4},4",
            num_classes=C,
            batch_size=8,
            num_epochs=20,
            max_steps=10,
            model="MoeModel",
            train_dir=train_dir,
            save_checkpoint_every_n_steps=10,
            export_model_steps=5,
            log_every_n_steps=100,
            hparams=HP,
        )
    ).run()
    export_dir = os.path.join(train_dir, "export", "step_10")
    assert os.path.isdir(export_dir)
    serve, meta = load_serving(export_dir)
    assert meta["model"] == "MoeModel"
    rng = np.random.default_rng(0)
    v, i = serve(
        rng.normal(size=(8, D)).astype(np.float32),
        np.ones((8,), np.int32),
    )
    assert np.asarray(v).shape == (8, min(20, C))  # top-k clamped to vocab


def test_ema_export_roundtrip(tmp_path):
    """--use_ema_weights exports the Polyak average (r2 VERDICT item #4):
    meta.json records ema=true + full hparams, and the EMA artifact
    serves different outputs than the raw-weights artifact from an
    identically-seeded run."""
    from yt8m_tpu.config import TrainConfig
    from yt8m_tpu.data.synthetic import write_dataset
    from yt8m_tpu.infer.export import load_serving
    from yt8m_tpu.train.loop import Trainer

    data = str(tmp_path / "data")
    write_dataset(
        data, "train", num_shards=1, videos_per_shard=16,
        frame_level=False, num_classes=C, seed=5, rgb_dim=D - 4,
        audio_dim=4,
    )

    def run(train_dir, use_ema):
        Trainer(
            TrainConfig(
                train_data_pattern=os.path.join(data, "train-*.tfrecord"),
                feature_names="mean_rgb,mean_audio",
                feature_sizes=f"{D-4},4",
                num_classes=C,
                batch_size=8,
                num_epochs=20,
                max_steps=10,
                model="MoeModel",
                train_dir=train_dir,
                save_checkpoint_every_n_steps=10,
                export_model_steps=10,
                log_every_n_steps=100,
                ema_decay=0.9,
                use_ema_weights=use_ema,
                hparams=HP,
            )
        ).run()
        return load_serving(os.path.join(train_dir, "export", "step_10"))

    serve_ema, meta_ema = run(str(tmp_path / "run_ema"), True)
    serve_raw, meta_raw = run(str(tmp_path / "run_raw"), False)
    assert meta_ema["ema"] is True and meta_raw["ema"] is False
    assert meta_ema["hparams"]["vocab_size"] == C  # self-describing artifact

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, D)).astype(np.float32)
    nf = np.ones((8,), np.int32)
    v_ema, _ = serve_ema(feats, nf)
    v_raw, _ = serve_raw(feats, nf)
    # Identical seeds -> identical raw params; after 10 steps of decay-0.9
    # averaging the EMA tree must serve measurably different outputs.
    assert not np.allclose(np.asarray(v_ema), np.asarray(v_raw), atol=1e-6)


def test_summary_writer(tmp_path):
    from yt8m_tpu.utils.summary import SummaryWriter

    sw = SummaryWriter(str(tmp_path / "logs"), tensorboard=False)
    sw.add_global_step_summary(5, {"Loss": 1.5})
    sw.add_epoch_summary(5, {"GAP": 0.8})
    sw.close()
    lines = open(tmp_path / "logs" / "events.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 5 and rec["GlobalStep/Loss"] == 1.5


def test_convert_json_to_csv(tmp_path):
    from yt8m_tpu.utils.convert_prediction import convert

    jpath = tmp_path / "preds.json"
    with open(jpath, "w") as f:
        f.write(
            json.dumps(
                {
                    "video_id": "vidX",
                    "class_indexes": [3, 1, 2],
                    "predictions": [0.5, 0.9, 0.1],
                }
            )
            + "\n"
        )
    out = str(tmp_path / "out.csv")
    n = convert(str(jpath), out, top_k=2)
    assert n == 1
    lines = open(out).read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert lines[1] == "vidX,1 0.9 3 0.5"


def test_polymorphic_batch_export_serves_two_batch_sizes(tmp_path):
    """batch_size=0 exports a symbolic batch dim; one artifact must serve
    different batch sizes (was a false docstring claim in r1)."""
    import jax
    from yt8m_tpu.infer.export import export_model, load_serving

    model, variables = _make_variables()
    export_dir = str(tmp_path / "export_poly")
    export_model(
        export_dir, "MoeModel", HP, variables["params"],
        batch_size=0, top_k=5,
    )
    serve, meta = load_serving(export_dir)
    assert meta["batch_size"] == 0
    rng = np.random.default_rng(2)
    for b in (3, 16):
        feats = rng.normal(size=(b, D)).astype(np.float32)
        values, indices = serve(feats, np.ones((b,), np.int32))
        assert np.asarray(values).shape == (b, 5)
        # parity with direct apply at this batch size
        direct = model.apply(
            variables, jnp.asarray(feats), jnp.ones((b,), jnp.int32),
            train=False, rngs={"sample": jax.random.PRNGKey(0)},
        )["predictions"]
        top_direct = np.sort(np.asarray(direct), axis=1)[:, ::-1][:, :5]
        np.testing.assert_allclose(
            np.sort(np.asarray(values), axis=1)[:, ::-1],
            top_direct, rtol=1e-5, atol=1e-6,
        )


def test_polymorphic_frame_level_export(tmp_path):
    """Frame-level model (uint8 features + sampling) under a symbolic
    batch dim."""
    from yt8m_tpu.infer.export import export_model, load_serving
    from yt8m_tpu.models import get_model

    hp = HP.replace(max_frames=8)
    model = get_model("FrameLevelLogisticModel", hp)
    rng = np.random.default_rng(3)
    feats = rng.integers(0, 256, size=(2, 8, D), dtype=np.uint8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), np.full((2,), 8, np.int32), train=False,
    )
    export_dir = str(tmp_path / "export_frame_poly")
    export_model(
        export_dir, "FrameLevelLogisticModel", hp, variables["params"],
        batch_size=0, top_k=4,
    )
    serve, meta = load_serving(export_dir)
    for b in (2, 7):
        f = rng.integers(0, 256, size=(b, 8, D), dtype=np.uint8)
        nf = rng.integers(1, 9, size=(b,)).astype(np.int32)
        values, indices = serve(f, nf)
        assert np.asarray(values).shape == (b, 4)


def test_flagship_netvlad_lstm_export_roundtrip(tmp_path):
    """Export/serve the NetVladLstmModel flagship (BN batch_stats +
    VLAD + recurrence in one StableHLO artifact) and check parity with
    direct apply."""
    from yt8m_tpu.infer.export import export_model, load_serving

    hp = ModelHParams(
        vocab_size=C, feature_dim=D, max_frames=8,
        compute_dtype="float32", netvlad_cluster_size=4,
        netvlad_hidden_size=8, lstm_cells=6, lstm_layers=1,
        moe_num_mixtures=2,
    )
    model = get_model("NetVladLstmModel", hp)
    rng = np.random.default_rng(0)
    feats = rng.integers(0, 256, size=(3, 8, D), dtype=np.uint8)
    nf = np.array([8, 3, 5], np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats, jnp.float32), jnp.asarray(nf), train=False,
    )
    export_dir = str(tmp_path / "flagship")
    export_model(
        export_dir, "NetVladLstmModel", hp, variables["params"],
        batch_stats=variables.get("batch_stats"), batch_size=3, top_k=4,
    )
    serve, meta = load_serving(export_dir)
    assert meta["frame_level"] and meta["model"] == "NetVladLstmModel"
    values, indices = serve(feats, nf)
    values = np.asarray(values)
    assert values.shape == (3, 4)
    from yt8m_tpu.data.quantize import dequantize

    out = model.apply(
        variables, dequantize(jnp.asarray(feats, jnp.float32)),
        jnp.asarray(nf),
        train=False, rngs={"sample": jax.random.PRNGKey(0)},
    )
    top = np.sort(np.asarray(out["predictions"]), axis=1)[:, -4:][:, ::-1]
    np.testing.assert_allclose(values, top, atol=1e-5)


def test_polymorphic_export_with_pallas_dispatch_active(
    tmp_path, monkeypatch
):
    """Regression: with the Pallas serving tail default-ON (r3), a
    polymorphic-batch export (batch_size=0) used to crash at trace time
    — the symbolic batch dim hit the kernels' `min(block_b, b)` / pad
    arithmetic (InconclusiveDimensionOperation) in the fused MoE head,
    serving_topk, and the frame-level aggregation kernels. The dispatch
    sites now require kernels.static_shape() and fall back to the XLA
    graph under jax.export. YT8M_PALLAS_INTERPRET=1 forces the dispatch
    condition on CPU exactly as a TPU host would see it."""
    from yt8m_tpu.infer.export import export_model, load_serving

    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(11)

    # Video-level: exercises heads.py MoeHead + serving_topk dispatch.
    _, variables = _make_variables()
    export_dir = str(tmp_path / "poly_moe")
    export_model(
        export_dir, "MoeModel", HP, variables["params"],
        batch_size=0, top_k=5,
    )
    serve, _ = load_serving(export_dir)
    for b in (2, 5):
        feats = rng.normal(size=(b, D)).astype(np.float32)
        values, indices = serve(feats, np.ones((b,), np.int32))
        assert np.asarray(values).shape == (b, 5)
        idx = np.asarray(indices)
        assert idx.min() >= 0 and idx.max() < C

    # Frame-level DBoF: exercises the frame.py fused cluster+pool
    # dispatch on top of the head/topk ones.
    hp = HP.replace(
        max_frames=8, dbof_cluster_size=16, dbof_hidden_size=8,
    )
    model = get_model("GatedDbofModel", hp)
    feats = rng.integers(0, 256, size=(2, 8, D), dtype=np.uint8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), np.full((2,), 8, np.int32), train=False,
    )
    export_dir = str(tmp_path / "poly_dbof")
    export_model(
        export_dir, "GatedDbofModel", hp, variables["params"],
        batch_stats=variables.get("batch_stats"),
        batch_size=0, top_k=4,
    )
    serve, _ = load_serving(export_dir)
    for b in (2, 3):
        f = rng.integers(0, 256, size=(b, 8, D), dtype=np.uint8)
        nf = rng.integers(1, 9, size=(b,)).astype(np.int32)
        values, _ = serve(f, nf)
        assert np.asarray(values).shape == (b, 4)

    # Flagship: exercises the NetVLAD-aggregation and LSTM-recurrence
    # dispatch guards (models/netvlad.py, models/rnn.py) on top.
    hp = HP.replace(
        max_frames=8, netvlad_cluster_size=4, netvlad_hidden_size=8,
        lstm_cells=6, lstm_layers=1, moe_num_mixtures=2,
    )
    model = get_model("NetVladLstmModel", hp)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats, jnp.float32), np.full((2,), 8, np.int32),
        train=False,
    )
    export_dir = str(tmp_path / "poly_flagship")
    export_model(
        export_dir, "NetVladLstmModel", hp, variables["params"],
        batch_stats=variables.get("batch_stats"),
        batch_size=0, top_k=4,
    )
    serve, _ = load_serving(export_dir)
    for b in (2, 3):
        f = rng.integers(0, 256, size=(b, 8, D), dtype=np.uint8)
        nf = rng.integers(1, 9, size=(b,)).astype(np.int32)
        values, _ = serve(f, nf)
        assert np.asarray(values).shape == (b, 4)
