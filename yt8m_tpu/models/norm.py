"""BatchNorm helpers shared by the model zoo.

Every model's BN follows the reference's slim defaults (momentum 0.99,
eps 1e-3; frame_level_models.py passes these into slim.batch_norm). Two
implementations exist in this repo:

- ``batch_norm`` — the plain ``nn.BatchNorm`` wrapper used where the
  running stats never need folding.
- inline BN (frame.py / netvlad.py) built on ``bn_moments`` below, used
  where serving folds the stats into a Pallas kernel's affine.

Cross-replica semantics: under GSPMD (a plain multi-device jit) XLA
computes batch statistics over the GLOBAL batch automatically. The
MANUAL (shard_map) train step — required to keep Mosaic train kernels
on multi-device meshes, see train/step.py — sees only the local batch
shard, so both implementations take an ``axis_name``: when set, the
first and second moments are psum-averaged over that mesh axis, which
reproduces the global-batch statistics exactly (equal shard sizes by
construction of shard_map). ``hparams.bn_axis`` carries the axis; the
Trainer sets it on the TRAINING model only and never persists it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.99
BN_EPS = 1e-3


def batch_norm(train: bool, name: str, bn_axis: str = "") -> nn.BatchNorm:
    """nn.BatchNorm with the reference's slim defaults.

    ``bn_axis`` (usually ``hp.bn_axis``) makes training statistics
    cross-replica inside a shard_map body; "" is the single-program
    (GSPMD / single-device) behavior.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=jnp.float32,
        axis_name=bn_axis or None,
        name=name,
    )


def bn_moments(x, axis_name: str = ""):
    """Batch mean/var over axis 0, cross-replica when axis_name is set.

    Without an axis this is exactly the historical inline-BN math
    (jnp.mean / jnp.var) so single-device numerics are unchanged. With
    an axis the variance comes from psum-averaged first and second
    moments — E[x^2] - E[x]^2, clamped at 0 — matching what flax's
    BatchNorm(axis_name=...) computes.
    """
    if not axis_name:
        return jnp.mean(x, axis=0), jnp.var(x, axis=0)
    mean = jax.lax.pmean(jnp.mean(x, axis=0), axis_name)
    mean2 = jax.lax.pmean(
        jnp.mean(jnp.square(x), axis=0), axis_name
    )
    return mean, jnp.maximum(mean2 - jnp.square(mean), 0.0)
