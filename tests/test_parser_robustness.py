"""Native parser robustness on malformed/corrupt TFRecords.

The mmap parser must never crash on untrusted bytes: truncation, bogus
length fields, and garbage stop the shard cleanly; CRC validation
(ReaderConfig.validate_crc — 0 off, 1 length-field crc32c [default],
2 length+data, reference RecordReader semantics) catches corruption the
framing alone cannot.
"""

import os
import struct

import numpy as np
import pytest

from yt8m_tpu.data.pipeline import NativeBatchIterator, get_native_lib
from yt8m_tpu.data.readers import ReaderConfig
from yt8m_tpu.data.synthetic import write_dataset

pytestmark = pytest.mark.skipif(
    get_native_lib() is None, reason="native parser unavailable"
)

C = 10


@pytest.fixture(scope="module")
def good_shard(tmp_path_factory):
    root = tmp_path_factory.mktemp("robust")
    write_dataset(
        str(root), "train", num_shards=1, videos_per_shard=8,
        frame_level=False, num_classes=C, seed=0, rgb_dim=8, audio_dim=4,
    )
    return os.path.join(str(root), "train-0000.tfrecord")


def _count(path, validate_crc=1):
    cfg = ReaderConfig.video_level(num_classes=C)
    cfg.validate_crc = validate_crc
    n = 0
    for b in NativeBatchIterator([path], cfg, 4, prefetch=0):
        n += int(b["batch_mask"].sum())
    return n


@pytest.mark.parametrize(
    "name,mutate,expect",
    [
        # drop the last 37 bytes: final record is truncated, rest parse
        ("truncated_mid_record", lambda d: d[:-37], 7),
        ("truncated_in_header", lambda d: d[:7], 0),
        ("huge_length", lambda d: struct.pack("<Q", 2**60) + d[8:], 0),
        # length crafted so the additive bounds check would WRAP past
        # the mapping (the subtraction-form check must reject it)
        ("wrapping_length",
         lambda d: struct.pack("<Q", 2**64 - 16) + d[8:], 0),
        ("len_past_eof",
         lambda d: struct.pack("<Q", len(d) + 1000) + d[8:], 0),
        ("zero_file", lambda d: b"", 0),
        ("garbage", lambda d: bytes(np.random.default_rng(0).integers(
            0, 256, 4096, dtype=np.uint8)), 0),
    ],
)
def test_malformed_shards_never_crash(good_shard, tmp_path, name, mutate,
                                      expect):
    data = open(good_shard, "rb").read()
    p = str(tmp_path / f"{name}.tfrecord")
    with open(p, "wb") as f:
        f.write(mutate(data))
    assert _count(p) == expect


def test_crc_levels(good_shard, tmp_path):
    data = open(good_shard, "rb").read()
    bad_len = str(tmp_path / "bad_len.tfrecord")
    with open(bad_len, "wb") as f:
        f.write(data[:8] + b"\x00\x00\x00\x00" + data[12:])
    bad_byte = str(tmp_path / "bad_byte.tfrecord")
    with open(bad_byte, "wb") as f:  # flip one payload byte of record 1
        f.write(data[:20] + bytes([data[20] ^ 0xFF]) + data[21:])

    assert _count(good_shard, 0) == 8
    assert _count(good_shard, 1) == 8
    assert _count(good_shard, 2) == 8
    # length-crc corruption: caught at level >= 1 (shard dropped)
    assert _count(bad_len, 0) == 8
    assert _count(bad_len, 1) == 0
    # payload corruption: framing fine, only level 2 catches it — and
    # because the record boundary is CRC-trusted, only the ONE corrupt
    # record is skipped, not the rest of the shard
    assert _count(bad_byte, 1) == 8
    assert _count(bad_byte, 2) == 7


def test_framed_garbage_payload_fuzz(tmp_path):
    """Adversarial protobuf payloads behind VALID TFRecord framing (so
    they reach the field walker): random bytes, truncated varints, and
    crafted huge wire-2 lengths must never crash — the walker's
    subtraction-form bounds checks reject them."""
    from yt8m_tpu.data.crc32c import masked_crc_bytes

    rng = np.random.default_rng(42)
    p = str(tmp_path / "fuzz.tfrecord")
    with open(p, "wb") as f:
        payloads = [bytes(rng.integers(0, 256, int(n), dtype=np.uint8))
                    for n in rng.integers(1, 400, 64)]
        # crafted: field 1 wire 2 with a huge varint length
        payloads.append(
            b"\x0a" + b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01" + b"xx"
        )
        # crafted: truncated varint at the end
        payloads.append(b"\x0a\xff")
        # crafted: nested wire-2 lengths that exactly hit the boundary
        payloads.append(b"\x0a\x02\x0a\x00")
        for payload in payloads:
            length = struct.pack("<Q", len(payload))
            f.write(length)
            f.write(masked_crc_bytes(length))
            f.write(payload)
            f.write(masked_crc_bytes(payload))
    for lvl in (0, 1, 2):
        n = _count(p, lvl)  # must terminate without crashing
        assert n >= 0
