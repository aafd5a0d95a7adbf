"""Metric parity: our vectorised GAP/Hit@1/PERR/mAP vs a literal
formula-faithful oracle (heap + shuffled stable sort, as the published
YT-8M starter defines them)."""

import heapq
import random

import numpy as np
import pytest

from yt8m_tpu.metrics import (
    AveragePrecisionCalculator,
    EvaluationMetrics,
    ap_at_n,
    calculate_gap,
    calculate_hit_at_one,
    calculate_precision_at_equal_recall_rate,
)


# ---------------------------------------------------------------------------
# Oracle: direct transliteration of the published metric definitions.
# ---------------------------------------------------------------------------


def oracle_ap(predictions, actuals, n=None, total_num_positives=None):
    predictions = np.asarray(predictions, dtype=np.float64)
    actuals = np.asarray(actuals, dtype=np.float64)
    random.seed(0)
    suffidx = random.sample(range(len(predictions)), len(predictions))
    predictions = predictions[suffidx]
    actuals = actuals[suffidx]
    sortidx = sorted(
        range(len(predictions)), key=lambda k: predictions[k], reverse=True
    )
    if total_num_positives is None:
        numpos = np.size(np.where(actuals > 0))
    else:
        numpos = total_num_positives
    if numpos == 0:
        return 0.0
    if n is not None:
        numpos = min(numpos, n)
    delta_recall = 1.0 / numpos
    ap, poscount = 0.0, 0.0
    r = len(sortidx)
    if n is not None:
        r = min(r, n)
    for i in range(r):
        if actuals[sortidx[i]] > 0:
            poscount += 1
            ap += poscount / (i + 1) * delta_recall
    return ap


def oracle_gap(predictions, actuals, top_k=20):
    heap = []
    total_pos = 0
    for v in range(predictions.shape[0]):
        k = min(top_k, predictions.shape[1])
        idx = np.argpartition(predictions[v], -k)[-k:]
        for i in idx:
            heap.append((predictions[v, i], actuals[v, i]))
        total_pos += int(np.sum(actuals[v] > 0))
    preds = np.array([p for p, a in heap])
    acts = np.array([a for p, a in heap])
    return oracle_ap(preds, acts, n=None, total_num_positives=total_pos)


def _random_batch(rng, b, c, max_labels=5):
    preds = rng.random((b, c))
    actuals = np.zeros((b, c), dtype=np.float32)
    for i in range(b):
        k = int(rng.integers(1, max_labels + 1))
        actuals[i, rng.choice(c, size=k, replace=False)] = 1.0
    return preds, actuals


def test_ap_matches_oracle_no_ties():
    rng = np.random.default_rng(0)
    for trial in range(5):
        preds = rng.random(200)
        acts = (rng.random(200) < 0.2).astype(np.float64)
        for n in (None, 20, 50):
            ours = ap_at_n(preds, acts, n=n)
            ref = oracle_ap(preds, acts, n=n)
            assert ours == pytest.approx(ref, abs=1e-12)


def test_streaming_ap_equals_one_shot():
    rng = np.random.default_rng(1)
    preds = rng.random(500)
    acts = (rng.random(500) < 0.1).astype(np.float64)
    calc = AveragePrecisionCalculator(top_n=None)
    for s in range(0, 500, 97):
        calc.accumulate(preds[s : s + 97], acts[s : s + 97])
    assert calc.peek_ap_at_n() == pytest.approx(
        oracle_ap(preds, acts), abs=1e-12
    )


def test_bounded_topn_streaming_matches_oracle_heap():
    rng = np.random.default_rng(2)
    preds = rng.random(3000)
    acts = (rng.random(3000) < 0.05).astype(np.float64)
    top_n = 100
    calc = AveragePrecisionCalculator(top_n=top_n)
    for s in range(0, 3000, 251):
        calc.accumulate(preds[s : s + 251], acts[s : s + 251])
    # Oracle: keep top_n by prediction in a heap, then ap_at_n.
    heap = []
    for p, a in zip(preds, acts):
        if len(heap) < top_n:
            heapq.heappush(heap, (p, a))
        elif p > heap[0][0]:
            heapq.heapreplace(heap, (p, a))
    hp = np.array([p for p, a in heap])
    ha = np.array([a for p, a in heap])
    ref = oracle_ap(
        hp, ha, n=top_n, total_num_positives=int(np.sum(acts > 0))
    )
    assert calc.peek_ap_at_n() == pytest.approx(ref, abs=1e-12)


def test_hit_at_one():
    preds = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    actuals = np.array([[0, 1, 0], [0, 0, 1]], dtype=np.float64)
    assert calculate_hit_at_one(preds, actuals) == pytest.approx(0.5)


def test_perr():
    preds = np.array([[0.9, 0.8, 0.1, 0.0]])
    actuals = np.array([[1, 0, 1, 0]], dtype=np.float64)
    # 2 labels -> top-2 = {0, 1}, one hit -> PERR 0.5
    assert calculate_precision_at_equal_recall_rate(
        preds, actuals
    ) == pytest.approx(0.5)


def test_perr_matches_loop_oracle():
    """Vectorised PERR == the reference's per-row argpartition loop."""
    rng = np.random.default_rng(11)
    preds, actuals = _random_batch(rng, 80, 57)
    # include a zero-label row (contributes 0)
    actuals[3] = 0

    def loop_perr(predictions, acts):
        total = 0.0
        for row in range(acts.shape[0]):
            k = int(np.sum(acts[row]))
            if k == 0:
                continue
            top = np.argpartition(predictions[row], -k)[-k:]
            total += float(
                np.sum(acts[row][top] * (predictions[row][top] > 0))
            ) / k
        return total / acts.shape[0]

    got = calculate_precision_at_equal_recall_rate(preds, actuals)
    assert got == pytest.approx(loop_perr(preds, actuals), abs=1e-12)


def test_gap_matches_oracle():
    rng = np.random.default_rng(3)
    preds, actuals = _random_batch(rng, 64, 101)
    ours = calculate_gap(preds, actuals, top_k=20)
    ref = oracle_gap(preds, actuals, top_k=20)
    assert ours == pytest.approx(ref, abs=1e-12)


def test_gap_perfect_predictions():
    rng = np.random.default_rng(4)
    _, actuals = _random_batch(rng, 32, 50)
    preds = actuals + rng.random(actuals.shape) * 1e-3  # positives on top
    assert calculate_gap(preds, actuals) == pytest.approx(1.0)


def test_streaming_gap_equals_global():
    """EvaluationMetrics streamed over batches == one-shot calculate_gap."""
    rng = np.random.default_rng(5)
    preds, actuals = _random_batch(rng, 96, 73)
    m = EvaluationMetrics(num_class=73, top_k=20)
    for s in range(0, 96, 32):
        p, a = preds[s : s + 32], actuals[s : s + 32]
        m.accumulate(p, a, loss=np.zeros(p.shape[0]))
    out = m.get()
    assert out["gap"] == pytest.approx(
        calculate_gap(preds, actuals, 20), abs=1e-12
    )
    assert out["avg_hit_at_one"] == pytest.approx(
        calculate_hit_at_one(preds, actuals), abs=1e-12
    )
    assert out["avg_perr"] == pytest.approx(
        calculate_precision_at_equal_recall_rate(preds, actuals), abs=1e-12
    )


def test_batch_mask_drops_padded_rows():
    rng = np.random.default_rng(6)
    preds, actuals = _random_batch(rng, 8, 20)
    m1 = EvaluationMetrics(num_class=20)
    m1.accumulate(preds, actuals, loss=0.0)
    m2 = EvaluationMetrics(num_class=20)
    padded_p = np.vstack([preds, rng.random((4, 20))])
    padded_a = np.vstack([actuals, np.zeros((4, 20))])
    mask = np.array([1.0] * 8 + [0.0] * 4)
    m2.accumulate(padded_p, padded_a, loss=0.0, batch_mask=mask)
    assert m1.get()["gap"] == pytest.approx(m2.get()["gap"], abs=1e-12)


def test_map_per_class():
    rng = np.random.default_rng(7)
    preds, actuals = _random_batch(rng, 200, 11, max_labels=3)
    m = EvaluationMetrics(num_class=11, top_k=11)
    m.accumulate(preds, actuals, loss=0.0)
    aps = m.get()["aps"]
    assert len(aps) == 11
    # Per-class oracle: full-list AP per class (top_k=11 == num_classes so
    # nothing is truncated).
    for c in range(11):
        ref = oracle_ap(
            preds[:, c], actuals[:, c],
            n=None, total_num_positives=int(np.sum(actuals[:, c] > 0)),
        )
        assert aps[c] == pytest.approx(ref, abs=1e-12)


def test_ap_matches_oracle_with_ties():
    """Exact tie-break parity: f16-quantized scores create exact ties;
    AP must still equal the reference formula bit-for-bit."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        # Heavy ties: quantize to f16 AND draw from a tiny value set.
        preds = rng.random(300).astype(np.float16).astype(np.float64)
        preds[rng.random(300) < 0.3] = 0.5
        acts = (rng.random(300) < 0.2).astype(np.float64)
        for n in (None, 20, 50):
            ours = ap_at_n(preds, acts, n=n)
            ref = oracle_ap(preds, acts, n=n)
            assert ours == pytest.approx(ref, abs=1e-12), (trial, n)


def oracle_gap_by_class(predictions, actuals, top_k=20):
    """Literal reference flow: per-video top-k triplets (argpartition
    order), grouped into per-class lists, flattened BY CLASS into one
    global AP. Pool order matters under ties (the fixed tie-break
    permutation acts on the pooled sequence)."""
    b, c = predictions.shape
    k = min(top_k, c)
    triplets = []
    for v in range(b):
        idx = np.argpartition(predictions[v], -k)[-k:]
        triplets.extend(
            (int(i), predictions[v, i], actuals[v, i]) for i in idx
        )
    out_p = [[] for _ in range(c)]
    out_a = [[] for _ in range(c)]
    for cls, p, a in triplets:
        out_p[cls].append(p)
        out_a[cls].append(a)
    total_pos = int(np.sum(actuals > 0))
    flat_p = np.array([x for lst in out_p for x in lst])
    flat_a = np.array([x for lst in out_a for x in lst])
    return oracle_ap(flat_p, flat_a, n=None, total_num_positives=total_pos)


def test_gap_matches_oracle_with_tied_scores():
    rng = np.random.default_rng(8)
    preds = (rng.random((40, 30)) * 8).round() / 8  # many exact ties
    acts = (rng.random((40, 30)) < 0.15).astype(np.float64)
    assert calculate_gap(preds, acts) == pytest.approx(
        oracle_gap_by_class(preds, acts), abs=1e-12
    )


# ---------------------------------------------------------------------------
# Device-sparsified accumulation (accumulate_topk) equivalence.
# ---------------------------------------------------------------------------


def _host_topk_inputs(preds, labels, mask, big_k):
    """Mirror train.step.make_sparse_eval_step's device outputs in numpy."""
    order = np.argsort(-preds, axis=1, kind="stable")[:, :big_k]
    rows = np.arange(preds.shape[0])[:, None]
    vals = preds[rows, order].astype(np.float32)
    lab_k = labels[rows, order].astype(np.float32)
    pos = labels > 0
    return (
        vals,
        order.astype(np.int32),
        lab_k,
        pos.sum(axis=1).astype(np.int32),
        (pos & (mask > 0)[:, None]).sum(axis=0).astype(np.int32),
    )


def test_accumulate_topk_matches_dense():
    """Dense accumulate() and device-sparsified accumulate_topk() give
    bitwise-identical metrics (no-ties data, kv <= K)."""
    rng = np.random.default_rng(11)
    C, B, K = 40, 24, 16
    dense = EvaluationMetrics(C, top_k=5)
    sparse = EvaluationMetrics(C, top_k=5)
    for step in range(4):
        preds = rng.random((B, C)).astype(np.float32)
        labels = (rng.random((B, C)) < 0.1).astype(np.float32)
        if step == 1:
            labels[0] = 0.0  # a zero-label video (PERR guard)
        mask = np.ones((B,), np.float32)
        if step == 3:
            mask[-6:] = 0.0  # padded tail rows
        loss = rng.random((B,)).astype(np.float32)
        dense.accumulate(preds, labels, loss, mask)
        sparse.accumulate_topk(
            *_host_topk_inputs(preds, labels, mask, K), loss, mask
        )
    out_d, out_s = dense.get(), sparse.get()
    assert out_d["gap"] == out_s["gap"]
    assert out_d["avg_hit_at_one"] == out_s["avg_hit_at_one"]
    assert out_d["avg_perr"] == out_s["avg_perr"]
    assert out_d["avg_loss"] == out_s["avg_loss"]
    np.testing.assert_array_equal(out_d["aps"], out_s["aps"])


def test_sparse_eval_step_matches_dense_eval_step():
    """make_sparse_eval_step's on-device outputs drive accumulate_topk to
    the same metrics as the dense eval step + accumulate."""
    import jax

    from yt8m_tpu.models import get_model
    from yt8m_tpu.models.hparams import ModelHParams
    from yt8m_tpu.train import losses as losses_lib
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_eval_step, make_sparse_eval_step

    rng = np.random.default_rng(3)
    C, B = 30, 16
    hp = ModelHParams(compute_dtype="float32", vocab_size=C, feature_dim=12)
    model = get_model("LogisticModel", hp)
    loss_obj = losses_lib.get_loss("CrossEntropyLoss")
    batch = {
        "features": rng.random((B, 12)).astype(np.float32),
        "labels": (rng.random((B, C)) < 0.15).astype(np.float32),
        "num_frames": np.ones((B,), np.int32),
        "batch_mask": np.concatenate(
            [np.ones(B - 3, np.float32), np.zeros(3, np.float32)]
        ),
    }
    tx = make_optimizer(optimizer="AdamOptimizer", global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch, tx, frame_level=False
    )
    key = jax.random.PRNGKey(1)
    preds, loss = make_eval_step(model, loss_obj)(state, batch, key)
    outs = make_sparse_eval_step(model, loss_obj, 8)(state, batch, key)

    dense = EvaluationMetrics(C, top_k=5)
    sparse = EvaluationMetrics(C, top_k=5)
    dense.accumulate(
        np.asarray(preds), batch["labels"], np.asarray(loss),
        batch["batch_mask"],
    )
    h = jax.device_get(outs)
    sparse.accumulate_topk(
        np.asarray(h["topk_values"]),
        np.asarray(h["topk_indices"]),
        np.asarray(h["topk_labels"]),
        np.asarray(h["labels_per_video"]),
        np.asarray(h["class_positives"]),
        np.asarray(h["loss"]),
        batch["batch_mask"],
    )
    out_d, out_s = dense.get(), sparse.get()
    assert out_d["gap"] == pytest.approx(out_s["gap"], abs=1e-12)
    assert out_d["avg_hit_at_one"] == out_s["avg_hit_at_one"]
    assert out_d["avg_perr"] == pytest.approx(out_s["avg_perr"], abs=1e-12)
    np.testing.assert_allclose(out_d["aps"], out_s["aps"], atol=1e-12)


def test_sparse_eval_step_nonfinite_tripwire():
    """A diverged checkpoint (NaN params) must be COUNTED by the sparse
    eval step's nonfinite_predictions reduce (masked rows excluded), and
    a healthy state must report 0."""
    import jax
    import jax.numpy as jnp

    from yt8m_tpu.models import get_model
    from yt8m_tpu.models.hparams import ModelHParams
    from yt8m_tpu.train import losses as losses_lib
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_sparse_eval_step

    rng = np.random.default_rng(5)
    C, B = 20, 8
    hp = ModelHParams(compute_dtype="float32", vocab_size=C, feature_dim=6)
    model = get_model("LogisticModel", hp)
    loss_obj = losses_lib.get_loss("CrossEntropyLoss")
    batch = {
        "features": rng.random((B, 6)).astype(np.float32),
        "labels": (rng.random((B, C)) < 0.2).astype(np.float32),
        "num_frames": np.ones((B,), np.int32),
        "batch_mask": np.concatenate(
            [np.ones(B - 2, np.float32), np.zeros(2, np.float32)]
        ),
    }
    tx = make_optimizer(optimizer="AdamOptimizer", global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch, tx, frame_level=False
    )
    key = jax.random.PRNGKey(1)
    step = make_sparse_eval_step(model, loss_obj, 8)

    healthy = jax.device_get(step(state, batch, key))
    assert int(healthy["nonfinite_predictions"]) == 0

    nan_state = state.replace(
        params=jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), state.params
        )
    )
    sick = jax.device_get(step(nan_state, batch, key))
    # every prediction of every UNMASKED row is NaN
    assert int(sick["nonfinite_predictions"]) == (B - 2) * C
    # indices remain valid in-range (exact_topk sanitisation contract
    # holds on the lax.top_k fallback too via take_along_axis bounds)
    idx = np.asarray(sick["topk_indices"])
    assert idx.min() >= 0 and idx.max() < C
