"""Wire-format parity: our proto/TFRecord codec vs TensorFlow's (the oracle
for what the reference's readers.py consumed)."""

import numpy as np
import pytest

from yt8m_tpu.data import proto
from yt8m_tpu.data.crc32c import crc32c
from yt8m_tpu.data.tfrecord import tfrecord_iterator, write_tfrecords


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C.
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_example_roundtrip():
    ex = {
        "id": ("bytes", [b"vid01"]),
        "labels": ("int64", [3, 77, 4000]),
        "mean_rgb": ("float", [0.5, -1.25, 3.0]),
    }
    buf = proto.encode_example(ex)
    out = proto.decode_example(buf)
    assert out["id"] == ("bytes", [b"vid01"])
    assert out["labels"] == ("int64", [3, 77, 4000])
    kind, vals = out["mean_rgb"]
    assert kind == "float"
    np.testing.assert_allclose(vals, [0.5, -1.25, 3.0], rtol=1e-6)


def test_sequence_example_roundtrip():
    ctx = {"id": ("bytes", [b"v"]), "labels": ("int64", [0, 4715])}
    fl = {
        "rgb": [("bytes", [bytes(range(10))]), ("bytes", [bytes(10)])],
        "audio": [("bytes", [b"\x01\x02"]), ("bytes", [b"\x03\x04"])],
    }
    buf = proto.encode_sequence_example(ctx, fl)
    octx, ofl = proto.decode_sequence_example(buf)
    assert octx["labels"] == ("int64", [0, 4715])
    assert ofl["rgb"][0][1][0] == bytes(range(10))
    assert len(ofl["audio"]) == 2


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"", b"x" * 1000]
    write_tfrecords(path, recs)
    out = list(tfrecord_iterator(path, verify_crc=True))
    assert out == recs


@pytest.fixture(scope="module")
def tf():
    return pytest.importorskip("tensorflow")


def test_example_parses_with_tf(tf):
    buf = proto.encode_example(
        {
            "id": ("bytes", [b"vid9"]),
            "labels": ("int64", [1, 2, 300]),
            "mean_rgb": ("float", list(np.arange(8, dtype=np.float32))),
        }
    )
    ex = tf.train.Example.FromString(buf)
    f = ex.features.feature
    assert list(f["id"].bytes_list.value) == [b"vid9"]
    assert list(f["labels"].int64_list.value) == [1, 2, 300]
    np.testing.assert_allclose(
        list(f["mean_rgb"].float_list.value), np.arange(8), rtol=1e-6
    )


def test_sequence_example_parses_with_tf(tf):
    frames = [bytes([i] * 4) for i in range(3)]
    buf = proto.encode_sequence_example(
        {"id": ("bytes", [b"v0"]), "labels": ("int64", [7])},
        {"rgb": [("bytes", [fr]) for fr in frames]},
    )
    se = tf.train.SequenceExample.FromString(buf)
    assert list(se.context.feature["labels"].int64_list.value) == [7]
    got = [
        feat.bytes_list.value[0]
        for feat in se.feature_lists.feature_list["rgb"].feature
    ]
    assert got == frames


def test_tfrecord_file_readable_by_tf(tf, tmp_path):
    path = str(tmp_path / "ours.tfrecord")
    recs = [b"abc", b"d" * 257]
    write_tfrecords(path, recs)
    ds = tf.data.TFRecordDataset(path)
    got = [r.numpy() for r in ds]
    assert got == recs


def test_tf_written_file_readable_by_us(tf, tmp_path):
    path = str(tmp_path / "tfs.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(b"first")
        w.write(b"second" * 100)
    out = list(tfrecord_iterator(path, verify_crc=True))
    assert out == [b"first", b"second" * 100]


def test_parse_example_matches_tf_parse(tf):
    """Our decoder vs tf.io.parse_single_example on the same bytes."""
    rng = np.random.default_rng(0)
    vec = rng.normal(size=32).astype(np.float32)
    buf = proto.encode_example(
        {
            "id": ("bytes", [b"vx"]),
            "labels": ("int64", [5, 9]),
            "mean_rgb": ("float", vec.tolist()),
        }
    )
    parsed = tf.io.parse_single_example(
        buf,
        {
            "id": tf.io.FixedLenFeature([], tf.string),
            "labels": tf.io.VarLenFeature(tf.int64),
            "mean_rgb": tf.io.FixedLenFeature([32], tf.float32),
        },
    )
    ours = proto.decode_example(buf)
    assert parsed["id"].numpy() == ours["id"][1][0]
    np.testing.assert_array_equal(
        tf.sparse.to_dense(parsed["labels"]).numpy(), ours["labels"][1]
    )
    np.testing.assert_allclose(
        parsed["mean_rgb"].numpy(), ours["mean_rgb"][1], rtol=1e-6
    )
