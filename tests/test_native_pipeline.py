"""Native C++ parser parity vs the pure-Python BatchIterator oracle."""

import numpy as np
import pytest

from yt8m_tpu.data.pipeline import (
    NativeBatchIterator,
    get_native_lib,
    make_batch_iterator,
)
from yt8m_tpu.data.readers import BatchIterator, ReaderConfig
from yt8m_tpu.data.synthetic import (
    write_frame_level_shard,
    write_video_level_shard,
)

pytestmark = pytest.mark.skipif(
    get_native_lib() is None, reason="native library unavailable"
)

C = 30


def _compare_batches(native_batches, python_batches, frame_level):
    assert len(native_batches) == len(python_batches)
    for nb, pb in zip(native_batches, python_batches):
        assert nb["id"] == pb["id"]
        np.testing.assert_array_equal(nb["features"], pb["features"])
        np.testing.assert_array_equal(nb["labels"], pb["labels"])
        np.testing.assert_array_equal(nb["batch_mask"], pb["batch_mask"])
        if frame_level:
            np.testing.assert_array_equal(nb["num_frames"], pb["num_frames"])
        if "teacher" in pb or "teacher" in nb:
            np.testing.assert_allclose(
                nb["teacher"], pb["teacher"], rtol=1e-6
            )


def test_video_level_parity(tmp_path):
    p1 = str(tmp_path / "a.tfrecord")
    p2 = str(tmp_path / "b.tfrecord")
    write_video_level_shard(p1, 11, num_classes=C, seed=0)
    write_video_level_shard(p2, 7, num_classes=C, seed=1)
    cfg = ReaderConfig.video_level(num_classes=C)
    nb = list(NativeBatchIterator([p1, p2], cfg, 4, prefetch=0))
    pb = list(BatchIterator([p1, p2], cfg, 4))
    _compare_batches(nb, pb, frame_level=False)


def test_frame_level_parity(tmp_path):
    p1 = str(tmp_path / "f.tfrecord")
    write_frame_level_shard(
        p1, 9, num_classes=C, min_frames=3, max_frames=25, seed=2
    )
    cfg = ReaderConfig.frame_level(num_classes=C, max_frames=15)
    nb = list(NativeBatchIterator([p1], cfg, 4, prefetch=0))
    pb = list(BatchIterator([p1], cfg, 4))
    _compare_batches(nb, pb, frame_level=True)


def test_frame_level_parity_with_prefetch(tmp_path):
    p1 = str(tmp_path / "f.tfrecord")
    write_frame_level_shard(p1, 20, num_classes=C, max_frames=30, seed=3)
    cfg = ReaderConfig.frame_level(num_classes=C, max_frames=30)
    nb = list(NativeBatchIterator([p1], cfg, 8, prefetch=2))
    pb = list(BatchIterator([p1], cfg, 8))
    _compare_batches(nb, pb, frame_level=True)


def test_distill_feature_parity(tmp_path):
    from yt8m_tpu.ensemble.distill import write_distill_dataset

    src = str(tmp_path / "src.tfrecord")
    ids = write_video_level_shard(src, 5, num_classes=C, seed=4)
    teacher = {
        v.decode(): np.random.default_rng(i).random(C).astype(np.float32)
        for i, v in enumerate(ids)
    }
    out_dir = str(tmp_path / "distilled")
    write_distill_dataset(src, teacher, out_dir, frame_level=False)
    cfg = ReaderConfig.video_level(num_classes=C)
    cfg.distill_feature = "predictions"
    cfg.distill_dim = C
    pattern = out_dir + "/*.tfrecord"
    nb = list(NativeBatchIterator(pattern, cfg, 5, prefetch=0))
    pb = list(BatchIterator(pattern, cfg, 5))
    _compare_batches(nb, pb, frame_level=False)
    assert "teacher" in nb[0]


def test_multi_epoch_native(tmp_path):
    p1 = str(tmp_path / "v.tfrecord")
    write_video_level_shard(p1, 6, num_classes=C, seed=5)
    cfg = ReaderConfig.video_level(num_classes=C)
    batches = list(
        NativeBatchIterator([p1], cfg, 4, num_epochs=2, prefetch=0)
    )
    total = sum(int(b["batch_mask"].sum()) for b in batches)
    assert total == 12


def test_multiprocess_reader_covers_all_videos(tmp_path):
    from yt8m_tpu.data.pipeline import MultiprocessBatchIterator

    paths, all_ids = [], []
    for s in range(3):
        p = str(tmp_path / f"train-{s:04d}.tfrecord")
        ids = write_video_level_shard(p, 10, num_classes=C, seed=s)
        paths.append(p)
        all_ids.extend(ids)
    cfg = ReaderConfig.video_level(num_classes=C)
    it = MultiprocessBatchIterator(
        paths, cfg, batch_size=4, num_workers=2, num_epochs=1
    )
    seen = [
        vid
        for b in it
        for vid, m in zip(b["id"], b["batch_mask"])
        if m
    ]
    assert sorted(seen) == sorted(all_ids)


def test_make_batch_iterator_prefers_native(tmp_path):
    p1 = str(tmp_path / "v.tfrecord")
    write_video_level_shard(p1, 4, num_classes=C, seed=6)
    cfg = ReaderConfig.video_level(num_classes=C)
    it = make_batch_iterator([p1], cfg, 4)
    assert isinstance(it, NativeBatchIterator)


def test_native_csv_formatter_byte_identical():
    """cpp yt8m_format_topk output == Python format_lines, including
    ties (stable order), exponent-notation values, and short ids."""
    import numpy as np
    from yt8m_tpu.infer.predict import format_lines, format_lines_text

    rng = np.random.default_rng(3)
    n, k = 37, 20
    vals = rng.random((n, k)).astype(np.float32)
    vals[0, :] = 0.25          # all ties -> stable original order
    vals[1, :5] = 1e-7         # %g exponent notation
    vals[2, 0] = 0.0
    idxs = rng.integers(0, 4716, (n, k)).astype(np.int32)
    ids = [f"vid{i:08d}".encode() for i in range(n)]
    ids[5] = b"s"
    want = "".join(format_lines(ids, vals, idxs))
    got = format_lines_text(ids, vals, idxs)
    assert got == want


def test_threaded_reader_covers_all_videos_and_content(tmp_path):
    """num_readers>1 default: thread fan-out yields every video exactly
    once per epoch with batch content identical to the 1-reader path."""
    import numpy as np
    from yt8m_tpu.data.pipeline import ThreadedBatchIterator

    paths, all_ids = [], []
    for s in range(3):
        p = str(tmp_path / f"train-{s:04d}.tfrecord")
        ids = write_video_level_shard(p, 10, num_classes=C, seed=100 + s)
        paths.append(p)
        all_ids.extend(ids)
    cfg = ReaderConfig.video_level(num_classes=C)
    ref = {}
    for b in NativeBatchIterator(paths, cfg, 4, num_epochs=1, prefetch=0):
        for i, (vid, m) in enumerate(zip(b["id"], b["batch_mask"])):
            if m:
                ref[vid] = (b["features"][i].copy(), b["labels"][i].copy())
    it = ThreadedBatchIterator(
        paths, cfg, batch_size=4, num_workers=3, num_epochs=1
    )
    seen = {}
    for b in it:
        for i, (vid, m) in enumerate(zip(b["id"], b["batch_mask"])):
            if m:
                seen[vid] = (b["features"][i], b["labels"][i])
    assert sorted(seen) == sorted(all_ids)
    for vid, (f_ref, l_ref) in ref.items():
        np.testing.assert_array_equal(seen[vid][0], f_ref)
        np.testing.assert_array_equal(seen[vid][1], l_ref)


def test_make_batch_iterator_threads_by_default(tmp_path):
    from yt8m_tpu.data.pipeline import (
        MultiprocessBatchIterator,
        ThreadedBatchIterator,
    )

    paths = []
    for s in range(2):
        p = str(tmp_path / f"t-{s}.tfrecord")
        write_video_level_shard(p, 4, num_classes=C, seed=s)
        paths.append(p)
    cfg = ReaderConfig.video_level(num_classes=C)
    assert isinstance(
        make_batch_iterator(paths, cfg, 4, num_readers=2),
        ThreadedBatchIterator,
    )
    assert isinstance(
        make_batch_iterator(
            paths, cfg, 4, num_readers=2, reader_processes=True
        ),
        MultiprocessBatchIterator,
    )


def _many_label_shard(path, label_counts, num_classes, dim=16):
    """Shard whose i-th video has exactly label_counts[i] labels."""
    from yt8m_tpu.data.proto import encode_example
    from yt8m_tpu.data.tfrecord import write_tfrecords

    rng = np.random.default_rng(0)
    records = []
    for i, k in enumerate(label_counts):
        labels = rng.choice(num_classes, size=k, replace=False)
        labels.sort()
        records.append(
            encode_example(
                {
                    "id": ("bytes", [f"many{i:03d}".encode()]),
                    "labels": ("int64", labels.tolist()),
                    "mean_rgb": ("float", rng.normal(size=dim).tolist()),
                }
            )
        )
    write_tfrecords(path, records)


def test_labels_written_verbatim_beyond_64_per_video(tmp_path):
    """No silent per-video label cap: a 100-label video's ground truth
    survives the native parser intact (reference reader semantics); the
    dense multi-hot matches the pure-Python oracle exactly."""
    p = str(tmp_path / "many.tfrecord")
    counts = [100, 80, 2, 70]
    _many_label_shard(p, counts, num_classes=200)
    cfg = ReaderConfig(
        feature_names="mean_rgb", feature_sizes="16",
        frame_features=False, num_classes=200,
    )
    nb = list(NativeBatchIterator([p], cfg, 4, prefetch=0))
    pb = list(BatchIterator([p], cfg, 4))
    _compare_batches(nb, pb, frame_level=False)
    got = nb[0]["labels"].sum(axis=1).astype(int).tolist()
    assert got == counts  # > 64 labels preserved


def test_label_budget_overflow_drops_and_warns(tmp_path, caplog):
    """Flat budget overflow (batch_size*64 slots) is counted and warned
    about, never silent: batch=1 gives a 64-slot budget, so a 100-label
    video loses 36 labels with a loud warning."""
    import logging

    p = str(tmp_path / "overflow.tfrecord")
    _many_label_shard(p, [100], num_classes=200)
    cfg = ReaderConfig(
        feature_names="mean_rgb", feature_sizes="16",
        frame_features=False, num_classes=200,
    )
    with caplog.at_level(logging.WARNING, logger="yt8m_tpu.data"):
        nb = list(NativeBatchIterator([p], cfg, 1, prefetch=0))
    assert int(nb[0]["labels"].sum()) == 64
    assert any("DROPPED" in r.message for r in caplog.records)
