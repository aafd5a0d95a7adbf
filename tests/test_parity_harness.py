"""TF1-parity harness self-test (cli/parity.py; r2 VERDICT item #3).

Synthetic dumps with injected deltas: identical predictions must report
zero delta and pass the 0.1% bar; a degraded prediction set must fail
it; CSV and sparse-npz inputs carrying the same content must agree.
"""

import json
import os

import numpy as np
import pytest

from yt8m_tpu.cli import parity

C = 32  # classes
N = 200  # videos
K = 20


def _make_split(seed=0):
    """Labels + a 'reference' prediction set that mostly ranks the true
    classes on top (so GAP/Hit@1/PERR are in a meaningful mid-range)."""
    rng = np.random.default_rng(seed)
    labels, preds = {}, {}
    for i in range(N):
        vid = f"vid{i:04d}"
        n_pos = int(rng.integers(1, 4))
        pos = rng.choice(C, size=n_pos, replace=False).astype(np.int32)
        labels[vid] = pos
        scores = rng.uniform(0.0, 0.45, size=C)
        # plant the positives high on ~85% of videos
        if rng.uniform() < 0.85:
            scores[pos] = rng.uniform(0.6, 0.99, size=n_pos)
        order = np.argsort(-scores)[:K]
        preds[vid] = (order.astype(np.int32), scores[order].astype(np.float64))
    return labels, preds


def _degrade(preds, frac=0.5, seed=1):
    """Reverse the score order on a fraction of videos (worst-case rank
    inversion -> a large, sign-definite GAP drop)."""
    rng = np.random.default_rng(seed)
    out = {}
    for vid, (idx, val) in preds.items():
        if rng.uniform() < frac:
            out[vid] = (idx.copy(), val[::-1].copy())
        else:
            out[vid] = (idx, val)
    return out


def _write_csv(path, preds):
    with open(path, "w") as f:
        f.write("VideoId,LabelConfidencePairs\n")
        for vid, (idx, val) in preds.items():
            pairs = " ".join(
                "%i %g" % (int(i), float(v)) for i, v in zip(idx, val)
            )
            f.write(f"{vid},{pairs}\n")


def _write_sparse_npz(path, preds):
    vids = sorted(preds)
    np.savez_compressed(
        path,
        ids=np.asarray(vids),
        values=np.stack([preds[v][1] for v in vids]).astype(np.float32),
        indices=np.stack([preds[v][0] for v in vids]).astype(np.int32),
        num_classes=np.int32(C),
    )


def _write_labels_csv(path, labels):
    with open(path, "w") as f:
        for vid, pos in labels.items():
            f.write(f"{vid},{' '.join(str(int(c)) for c in pos)}\n")


def test_identical_predictions_pass():
    labels, ref = _make_split()
    report = parity.compare(ref, ref, labels, num_classes=C, top_k=K)
    assert report["pass"] is True
    assert report["videos_compared"] == N
    for k in ("gap", "hit_at_one", "perr", "map"):
        assert report["delta"][k] == pytest.approx(0.0, abs=1e-12)
    # sanity: the synthetic split is in a meaningful range, not 0/1
    assert 0.5 < report["reference"]["gap"] < 1.0


def test_injected_delta_fails_bar():
    labels, ref = _make_split()
    ours = _degrade(ref, frac=0.5)
    report = parity.compare(ref, ours, labels, num_classes=C, top_k=K)
    assert report["pass"] is False
    assert report["delta"]["gap"] < -0.001  # a real, sign-definite drop


def test_inner_join_and_coverage_counts():
    labels, ref = _make_split()
    ours = {v: p for v, p in ref.items() if not v.endswith("7")}
    extra_idx = np.arange(K, dtype=np.int32)
    ours["not_in_ref"] = (extra_idx, np.linspace(1, 0.5, K))
    report = parity.compare(ref, ours, labels, num_classes=C, top_k=K)
    assert report["videos_compared"] == len(set(ref) & set(ours))
    assert report["videos_reference_only"] > 0
    assert report["videos_ours_only"] == 1
    assert report["pass"] is True  # same scores on the joined set


def test_csv_and_sparse_npz_agree(tmp_path):
    labels, ref = _make_split()
    csv_path = str(tmp_path / "preds.csv")
    npz_path = str(tmp_path / "preds-00000.npz")
    _write_csv(csv_path, ref)
    _write_sparse_npz(npz_path, ref)
    from_csv = parity.load_predictions(csv_path)
    from_npz = parity.load_predictions(npz_path)
    assert set(from_csv) == set(from_npz)
    report = parity.compare(
        from_csv, from_npz, labels, num_classes=C, top_k=K
    )
    # CSV carries %g-rounded scores; ranks are preserved, so the metric
    # delta is exactly zero.
    assert report["pass"] is True
    for k in ("gap", "hit_at_one", "perr"):
        assert report["delta"][k] == pytest.approx(0.0, abs=1e-9)


def test_cli_end_to_end(tmp_path, capsys):
    labels, ref = _make_split()
    ref_csv = str(tmp_path / "ref.csv")
    ours_csv = str(tmp_path / "ours.csv")
    bad_csv = str(tmp_path / "bad.csv")
    labels_csv = str(tmp_path / "labels.csv")
    _write_csv(ref_csv, ref)
    _write_csv(ours_csv, ref)
    _write_csv(bad_csv, _degrade(ref, frac=0.6))
    _write_labels_csv(labels_csv, labels)

    common = [
        f"--labels={labels_csv}", f"--num_classes={C}", f"--top_k={K}",
    ]
    rc = parity.main(
        [f"--reference_predictions={ref_csv}",
         f"--our_predictions={ours_csv}"] + common
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc == 0 and report["pass"] is True

    rc_bad = parity.main(
        [f"--reference_predictions={ref_csv}",
         f"--our_predictions={bad_csv}"] + common
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc_bad == 1 and report["pass"] is False


def test_labels_from_tfrecords(tmp_path):
    """Label extraction straight from YT-8M TFRecords (no feature config)
    for BOTH wire formats, video-level Example and frame-level
    SequenceExample."""
    from yt8m_tpu.data.synthetic import write_dataset

    data = str(tmp_path / "data")
    write_dataset(
        data, "video", num_shards=1, videos_per_shard=8,
        frame_level=False, num_classes=C, seed=3, rgb_dim=8, audio_dim=4,
    )
    write_dataset(
        data, "frame", num_shards=1, videos_per_shard=8,
        frame_level=True, num_classes=C, seed=4, rgb_dim=8, audio_dim=4,
        max_frames=16,
    )
    vid_labels = parity.load_labels(os.path.join(data, "video-*.tfrecord"))
    frm_labels = parity.load_labels(os.path.join(data, "frame-*.tfrecord"))
    assert len(vid_labels) == 8 and len(frm_labels) == 8
    assert all(len(v) > 0 for v in vid_labels.values())
    assert all(len(v) > 0 for v in frm_labels.values())
