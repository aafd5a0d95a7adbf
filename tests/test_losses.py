"""Loss semantics vs manual formulas (reference: losses.py)."""

import numpy as np
import pytest

from yt8m_tpu.train.losses import get_loss

P = np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.01]], dtype=np.float32)
Y = np.array([[1, 0, 1], [0, 1, 0]], dtype=np.float32)


def test_cross_entropy():
    eps = 10e-6
    p = np.clip(P, eps, 1 - eps)
    expected = -(Y * np.log(p) + (1 - Y) * np.log(1 - p)).sum(axis=1)
    got = np.asarray(get_loss("CrossEntropyLoss").calculate_loss(P, Y))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_hinge():
    signs = 1 - 2 * Y
    expected = np.maximum(0.0, 1.0 + signs * P).sum(axis=1)
    got = np.asarray(get_loss("HingeLoss").calculate_loss(P, Y))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_softmax_loss_normalises_labels():
    got = np.asarray(get_loss("SoftmaxLoss").calculate_loss(P, Y))
    assert got.shape == (2,)
    assert np.all(got > 0)


def test_distill_mix():
    teacher = np.array(
        [[0.8, 0.2, 0.6], [0.1, 0.9, 0.05]], dtype=np.float32
    )
    loss = get_loss("MixedCrossEntropyDistillLoss", alpha=0.7)
    got = np.asarray(loss.calculate_loss(P, Y, teacher=teacher))
    ce = get_loss("CrossEntropyLoss")
    hard = np.asarray(ce.calculate_loss(P, Y))
    soft = np.asarray(ce.calculate_loss(P, teacher))
    np.testing.assert_allclose(got, 0.7 * hard + 0.3 * soft, rtol=1e-5)
    # without teacher falls back to hard CE
    np.testing.assert_allclose(
        np.asarray(loss.calculate_loss(P, Y)), hard, rtol=1e-6
    )


def test_unknown_loss():
    with pytest.raises(ValueError):
        get_loss("NopeLoss")
