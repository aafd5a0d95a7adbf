"""Ensembling: npz alignment, weighted average, GAP weight fitting,
checkpoint-style averaging, distillation data prep, bagging."""

import os

import numpy as np
import pytest

from yt8m_tpu.data.readers import BatchIterator, ReaderConfig
from yt8m_tpu.data.synthetic import write_video_level_shard
from yt8m_tpu.ensemble.average import (
    align_members,
    ensemble_directories,
    fit_weights_by_gap,
    labels_from_tfrecords,
    load_prediction_dir,
    weighted_average,
)
from yt8m_tpu.ensemble.bagging import bag_files
from yt8m_tpu.ensemble.distill import (
    teacher_from_prediction_dir,
    write_distill_dataset,
)
from yt8m_tpu.metrics import calculate_gap

C = 12


def _dump(directory, ids, preds, chunk=3):
    os.makedirs(directory, exist_ok=True)
    for n, s in enumerate(range(0, len(ids), chunk)):
        np.savez_compressed(
            os.path.join(directory, f"predictions-{n:05d}.npz"),
            ids=np.asarray(ids[s : s + chunk]),
            predictions=preds[s : s + chunk].astype(np.float16),
        )


def test_load_align_average(tmp_path):
    rng = np.random.default_rng(0)
    ids = [f"v{i}" for i in range(10)]
    p1 = rng.random((10, C)).astype(np.float32)
    p2 = rng.random((10, C)).astype(np.float32)
    _dump(str(tmp_path / "m1"), ids, p1)
    # member 2 dumped in a different order
    perm = rng.permutation(10)
    _dump(str(tmp_path / "m2"), [ids[i] for i in perm], p2[perm])

    got_ids, got_p1 = load_prediction_dir(str(tmp_path / "m1"))
    assert got_ids == ids
    base_ids, aligned = align_members(
        [load_prediction_dir(str(tmp_path / "m1")),
         load_prediction_dir(str(tmp_path / "m2"))]
    )
    np.testing.assert_allclose(aligned[1], p2.astype(np.float16), atol=1e-3)

    avg = weighted_average(aligned, [1.0, 3.0])
    np.testing.assert_allclose(
        avg,
        (0.25 * p1.astype(np.float16) + 0.75 * p2.astype(np.float16)),
        atol=2e-3,
    )

    out_csv = str(tmp_path / "ens.csv")
    ids2, _ = ensemble_directories(
        [str(tmp_path / "m1"), str(tmp_path / "m2")],
        weights=[1, 1],
        output_csv=out_csv,
        top_k=4,
    )
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "VideoId,LabelConfidencePairs"
    assert len(lines) == 11


def test_fit_weights_prefers_better_member():
    rng = np.random.default_rng(1)
    labels = (rng.random((60, C)) < 0.2).astype(np.float32)
    good = labels * 0.9 + rng.random((60, C)) * 0.05
    bad = rng.random((60, C)).astype(np.float32)
    w = fit_weights_by_gap([good, bad], labels, top_k=C)
    assert w[0] > w[1]
    ens_gap = calculate_gap(weighted_average([good, bad], w), labels, C)
    bad_gap = calculate_gap(bad, labels, C)
    assert ens_gap > bad_gap


def test_distill_roundtrip(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    path = os.path.join(src, "train-0000.tfrecord")
    ids = write_video_level_shard(path, 6, num_classes=C, seed=2)
    teacher = {
        vid.decode(): np.linspace(0, 1, C).astype(np.float32) * (i + 1) / 6
        for i, vid in enumerate(ids)
    }
    out_dir = str(tmp_path / "distilled")
    n = write_distill_dataset(
        os.path.join(src, "*.tfrecord"), teacher, out_dir, frame_level=False
    )
    assert n == 6

    rc = ReaderConfig.video_level(num_classes=C)
    rc.distill_feature = "predictions"
    rc.distill_dim = C
    (batch,) = list(
        BatchIterator(
            os.path.join(out_dir, "*.tfrecord"), rc, batch_size=6,
        )
    )
    assert "teacher" in batch
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(
            batch["teacher"][i], teacher[vid.decode()], rtol=1e-5
        )

    labels = labels_from_tfrecords(
        os.path.join(out_dir, "*.tfrecord"), frame_level=False, num_classes=C
    )
    assert set(labels) == {v.decode() for v in ids}
    np.testing.assert_array_equal(
        labels[ids[0].decode()], batch["labels"][0]
    )


def test_teacher_from_prediction_dir(tmp_path):
    ids = ["a", "b"]
    preds = np.array([[0.1] * C, [0.9] * C], dtype=np.float32)
    _dump(str(tmp_path / "t"), ids, preds)
    teacher = teacher_from_prediction_dir(str(tmp_path / "t"))
    assert set(teacher) == {"a", "b"}
    np.testing.assert_allclose(teacher["b"], preds[1], atol=1e-3)


def test_bagging_partition(tmp_path):
    for i in range(6):
        open(tmp_path / f"train-{i:04d}.tfrecord", "w").write("x")
    pattern = str(tmp_path / "train-*.tfrecord")
    bag0 = bag_files(pattern, 3, 0)
    hold0 = bag_files(pattern, 3, 0, holdout=True)
    assert len(bag0) == 4 and len(hold0) == 2
    assert set(bag0).isdisjoint(hold0)
    all_files = sorted(bag0 + hold0)
    assert len(all_files) == 6


def test_fit_and_roundtrip_boost_weights(tmp_path):
    from yt8m_tpu.ensemble.boosting import (
        fit_boost_weights,
        load_boost_weights,
        save_boost_weights,
    )

    rng = np.random.default_rng(0)
    ids = [f"v{i}" for i in range(50)]
    labels = (rng.random((50, C)) < 0.2).astype(np.float32)
    # Half the videos predicted well, half badly.
    preds = np.where(labels > 0, 0.9, 0.1).astype(np.float32)
    preds[25:] = 1.0 - preds[25:]
    w = fit_boost_weights(ids, preds, labels)
    assert np.isclose(np.mean(list(w.values())), 1.0, atol=1e-6)
    good = np.mean([w[f"v{i}"] for i in range(25)])
    bad = np.mean([w[f"v{i}"] for i in range(25, 50)])
    assert bad > good * 1.5, (good, bad)
    path = str(tmp_path / "bw.npz")
    save_boost_weights(path, w)
    assert load_boost_weights(path) == pytest.approx(w)


def test_boosted_iterator_injects_weights():
    from yt8m_tpu.ensemble.boosting import BoostedIterator

    batches = [{
        "id": [b"a", b"b"],
        "batch_mask": np.ones((2,), np.float32),
        "features": np.zeros((2, 4), np.float32),
    }]
    out = list(BoostedIterator(batches, {"a": 2.0}))
    np.testing.assert_allclose(
        out[0]["example_weights"], [2.0, 1.0]
    )


def test_train_step_applies_example_weights():
    """Weighted loss == weighted mean of per-example losses."""
    import jax

    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    hp = ModelHParams(
        vocab_size=C, feature_dim=8, compute_dtype="float32"
    )
    model = get_model("LogisticModel", hp)
    rng = np.random.default_rng(1)
    base = {
        "features": rng.normal(size=(4, 8)).astype(np.float32),
        "labels": (rng.random((4, C)) < 0.3).astype(np.float32),
        "num_frames": np.ones((4,), np.int32),
        "batch_mask": np.ones((4,), np.float32),
    }
    tx = make_optimizer(global_batch_size=4)
    loss_obj = get_loss("CrossEntropyLoss")
    step = make_train_step(model, loss_obj, donate=False)

    w = np.array([2.0, 0.5, 1.0, 0.0], np.float32)
    weighted = dict(base, example_weights=w)

    state = init_train_state(model, jax.random.PRNGKey(0), base, tx, False)
    _, m_uniform = step(state, base, jax.random.PRNGKey(1))
    state2 = init_train_state(model, jax.random.PRNGKey(0), base, tx, False)
    _, m_weighted = step(state2, weighted, jax.random.PRNGKey(1))

    # oracle: per-example CE of the INITIAL model, weighted mean
    import jax.numpy as jnp

    out = model.apply(
        {"params": state.params}, jnp.asarray(base["features"]),
        jnp.asarray(base["num_frames"]), train=True,
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    per_ex = np.asarray(
        loss_obj.calculate_loss(out["predictions"], base["labels"])
    )
    want = float(np.sum(per_ex * w) / np.sum(w))
    assert float(m_weighted["label_loss"]) == pytest.approx(want, rel=1e-5)
    assert float(m_weighted["label_loss"]) != pytest.approx(
        float(m_uniform["label_loss"]), rel=1e-6
    )
