"""Reader semantics: dequantize values, frame pad/truncate, batching."""

import numpy as np

from yt8m_tpu.data.quantize import dequantize, quantize
from yt8m_tpu.data.readers import BatchIterator, ReaderConfig
from yt8m_tpu.data.synthetic import (
    write_frame_level_shard,
    write_video_level_shard,
)


def test_dequantize_formula():
    x = np.arange(256, dtype=np.uint8)
    y = dequantize(x.astype(np.float32))
    # Reference: feat * (max-min)/255 + ((max-min)/512 + min)
    expected = x * (4.0 / 255.0) + (4.0 / 512.0 - 2.0)
    np.testing.assert_allclose(y, expected, rtol=1e-6, atol=1e-6)
    assert y.min() >= -2.0 and y.max() <= 2.0 + 4.0 / 512.0


def test_quantize_dequantize_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=1000).astype(np.float32)
    q = quantize(x)
    x2 = dequantize(q.astype(np.float32))
    # Max quantization error is half a bucket = (4/255)/2, plus bucket bias.
    assert np.max(np.abs(x2 - x)) <= 4.0 / 255.0


def test_video_level_batches(tmp_path):
    path = str(tmp_path / "train-0000.tfrecord")
    ids = write_video_level_shard(path, 10, num_classes=100, seed=3)
    cfg = ReaderConfig.video_level(num_classes=100)
    it = BatchIterator([path], cfg, batch_size=4, num_epochs=1)
    batches = list(it)
    assert len(batches) == 3
    b0 = batches[0]
    assert b0["features"].shape == (4, 1152)
    assert b0["features"].dtype == np.float32
    assert b0["labels"].shape == (4, 100)
    assert b0["id"][0] == ids[0]
    # Final batch padded to batch_size with mask.
    b2 = batches[2]
    assert b2["features"].shape == (4, 1152)
    np.testing.assert_array_equal(b2["batch_mask"], [1, 1, 0, 0])
    assert np.all(b2["labels"][2:] == 0)


def test_label_dropout_thins_observed_labels(tmp_path):
    """label_dropout drops TRUE positives from the written records
    (incomplete-label regime for the distillation soak) while keeping
    >=1 label per video; dropout=0.0 leaves the byte stream unchanged."""
    clean = str(tmp_path / "clean.tfrecord")
    clean2 = str(tmp_path / "clean2.tfrecord")
    noisy = str(tmp_path / "noisy.tfrecord")
    write_video_level_shard(clean, 200, num_classes=100, seed=7)
    write_video_level_shard(clean2, 200, num_classes=100, seed=7,
                            label_dropout=0.0)
    write_video_level_shard(noisy, 200, num_classes=100, seed=7,
                            label_dropout=0.6)
    assert open(clean, "rb").read() == open(clean2, "rb").read()

    cfg = ReaderConfig.video_level(num_classes=100)

    def label_sets(path):
        out = []
        for b in BatchIterator([path], cfg, batch_size=8, num_epochs=1):
            for row, m in zip(b["labels"], b["batch_mask"]):
                if m:
                    out.append(set(np.nonzero(row)[0].tolist()))
        return out

    clean_sets, noisy_sets = label_sets(clean), label_sets(noisy)
    assert len(clean_sets) == len(noisy_sets) == 200
    assert all(len(s) >= 1 for s in noisy_sets)
    assert all(n <= c for n, c in zip(noisy_sets, clean_sets))
    n_clean = sum(len(s) for s in clean_sets)
    n_noisy = sum(len(s) for s in noisy_sets)
    assert n_noisy < n_clean


def test_frame_level_pad_truncate(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    meta = write_frame_level_shard(
        path, 6, num_classes=50, min_frames=5, max_frames=40, seed=1
    )
    cfg = ReaderConfig.frame_level(num_classes=50, max_frames=20)
    it = BatchIterator([path], cfg, batch_size=6, num_epochs=1)
    (batch,) = list(it)
    assert batch["features"].shape == (6, 20, 1152)
    assert batch["features"].dtype == np.uint8
    for i, (vid, nf) in enumerate(meta):
        assert batch["id"][i] == vid
        assert batch["num_frames"][i] == min(nf, 20)
        # Padded frames are zero.
        if nf < 20:
            assert np.all(batch["features"][i, nf:] == 0)


def test_epoch_iteration_counts(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    write_video_level_shard(path, 8, num_classes=10, seed=0)
    cfg = ReaderConfig.video_level(num_classes=10)
    it = BatchIterator([path], cfg, batch_size=4, num_epochs=3)
    total = sum(int(b["batch_mask"].sum()) for b in it)
    assert total == 24


def test_shuffle_preserves_multiset(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    ids = write_video_level_shard(path, 16, num_classes=10, seed=0)
    cfg = ReaderConfig.video_level(num_classes=10)
    it = BatchIterator(
        [path], cfg, batch_size=4, num_epochs=1, shuffle=True, seed=7
    )
    seen = [vid for b in it for vid, m in zip(b["id"], b["batch_mask"]) if m]
    assert sorted(seen) == sorted(ids)
