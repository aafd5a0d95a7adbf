"""Label losses (reference: losses.py).

Each loss maps (predictions [B, C] probabilities, labels [B, C] {0,1}) to a
per-example loss [B]; the driver does the masked batch mean. The reference
returned the scalar mean directly — per-example lets padded eval rows drop
out (SURVEY.md readers note).

Selected by --label_loss class name, same registry pattern as models.
"""

from __future__ import annotations

from typing import Dict, Type

import jax
import jax.numpy as jnp

_EPSILON = 10e-6  # reference losses.py epsilon


class BaseLoss:
    def calculate_loss(self, predictions, labels, **kw):
        raise NotImplementedError


class CrossEntropyLoss(BaseLoss):
    """Per-class sigmoid cross entropy, summed over classes.

    Reference: losses.py :: CrossEntropyLoss —
      eps-clipped  -(y log p + (1-y) log(1-p)), reduce_sum over classes,
      reduce_mean over batch (here: per-example sum returned).
    """

    def calculate_loss(self, predictions, labels, **kw):
        p = jnp.clip(
            predictions.astype(jnp.float32), _EPSILON, 1.0 - _EPSILON
        )
        y = labels.astype(jnp.float32)
        ce = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        return jnp.sum(ce, axis=-1)


class HingeLoss(BaseLoss):
    """Reference: losses.py :: HingeLoss (b=1.0) — labels mapped to ±1,
    hinge = max(0, b + (1-2y) * p), summed over classes."""

    def __init__(self, b: float = 1.0):
        self.b = b

    def calculate_loss(self, predictions, labels, **kw):
        y = labels.astype(jnp.float32)
        signs = 1.0 - 2.0 * y
        hinge = jnp.maximum(
            0.0, self.b + signs * predictions.astype(jnp.float32)
        )
        return jnp.sum(hinge, axis=-1)


class SoftmaxLoss(BaseLoss):
    """Reference: losses.py :: SoftmaxLoss — labels L1-normalised to a
    distribution (rowsum floored at ε=10e-8), loss =
    -sum(label_dist * log(softmax(predictions))).

    This is a TRUE exponential softmax over the prediction scores
    (`tf.nn.softmax`), applied even though the models emit sigmoid
    probabilities — matching the reference exactly. log∘softmax is
    computed as log_softmax for numerical stability; identical in exact
    arithmetic (softmax output is strictly positive, so the reference's
    un-clipped log never sees zero).
    """

    _EPS = 10e-8  # reference SoftmaxLoss epsilon (NOT the CE 10e-6)

    def calculate_loss(self, predictions, labels, **kw):
        y = labels.astype(jnp.float32)
        label_rowsum = jnp.maximum(
            jnp.sum(y, axis=-1, keepdims=True), self._EPS
        )
        norm_labels = y / label_rowsum
        log_sm = jax.nn.log_softmax(
            predictions.astype(jnp.float32), axis=-1
        )
        return -jnp.sum(norm_labels * log_sm, axis=-1)


class MixedCrossEntropyDistillLoss(BaseLoss):
    """Distillation mix (fork capability, SURVEY.md §2.2):
    alpha * CE(labels) + (1 - alpha) * CE(teacher soft targets)."""

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha
        self._ce = CrossEntropyLoss()

    def calculate_loss(self, predictions, labels, teacher=None, **kw):
        hard = self._ce.calculate_loss(predictions, labels)
        if teacher is None:
            return hard
        soft = self._ce.calculate_loss(predictions, teacher)
        return self.alpha * hard + (1.0 - self.alpha) * soft


_LOSSES: Dict[str, Type[BaseLoss]] = {
    "CrossEntropyLoss": CrossEntropyLoss,
    "HingeLoss": HingeLoss,
    "SoftmaxLoss": SoftmaxLoss,
    "MixedCrossEntropyDistillLoss": MixedCrossEntropyDistillLoss,
}


def get_loss(name: str, **kw) -> BaseLoss:
    if name not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; available {sorted(_LOSSES)}")
    return _LOSSES[name](**kw)
