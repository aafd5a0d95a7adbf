"""Frame sampling and pooling helpers (reference: model_utils.py).

All functions are jit-safe: static shapes, stateless PRNG keys threaded in
(the reference used tf.random_uniform graph RNG; here sampling determinism
is keyed by the train-step key, SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yt8m_tpu.data.quantize import dequantize


def ensure_float(features, dtype=jnp.float32):
    """Dequantize uint8 features on device; pass floats through.

    Models call this at the point of first arithmetic, AFTER any
    sampling/gather, so uint8 rides HBM (4x less traffic) until the last
    moment (SURVEY.md §6 bandwidth constraint).
    """
    if features.dtype == jnp.uint8:
        return dequantize(features.astype(dtype))
    return features.astype(dtype) if features.dtype != dtype else features


def frame_mask(num_frames, max_frames: int, dtype=jnp.float32):
    """[B] frame counts -> [B, F] validity mask."""
    pos = jnp.arange(max_frames, dtype=jnp.int32)[None, :]
    return (pos < num_frames.astype(jnp.int32)[:, None]).astype(dtype)


def sample_random_frames(rng, model_input, num_frames, num_samples: int):
    """Uniform-with-replacement frame sampling.

    Reference: model_utils.py :: SampleRandomFrames —
    index = floor(U[0,1) * num_frames) per (video, sample).
    """
    b = model_input.shape[0]
    u = jax.random.uniform(rng, (b, num_samples))
    idx = jnp.floor(
        u * jnp.maximum(num_frames.astype(jnp.float32), 1.0)[:, None]
    ).astype(jnp.int32)
    return jnp.take_along_axis(model_input, idx[:, :, None], axis=1)


def sample_random_sequence(rng, model_input, num_frames, num_samples: int):
    """Contiguous random crop (reference: SampleRandomSequence).

    start = floor(U * (max(num_frames - num_samples, 0) + 1)), so every
    valid window INCLUDING the last (start = num_frames - num_samples) is
    reachable uniformly; indices clipped to the valid range so short
    videos repeat their last frame.
    """
    b, f, _ = model_input.shape
    u = jax.random.uniform(rng, (b, 1))
    max_start = (
        jnp.maximum(num_frames.astype(jnp.float32) - num_samples, 0.0)
        + 1.0
    )[:, None]
    start = jnp.floor(u * max_start).astype(jnp.int32)
    offsets = jnp.arange(num_samples, dtype=jnp.int32)[None, :]
    idx = jnp.clip(
        start + offsets, 0,
        jnp.maximum(num_frames.astype(jnp.int32) - 1, 0)[:, None],
    )
    return jnp.take_along_axis(model_input, idx[:, :, None], axis=1)


def frame_pooling(frames, method: str, mask=None):
    """Pool [B, F, D] -> [B, D]. `mask` [B, F] restricts to real frames.

    Reference: model_utils.py :: FramePooling (max | average).
    """
    if method == "max":
        if mask is not None:
            neg = jnp.asarray(-1e9, frames.dtype)
            frames = jnp.where(mask[:, :, None] > 0, frames, neg)
        return jnp.max(frames, axis=1)
    if method in ("average", "mean"):
        if mask is None:
            return jnp.mean(frames, axis=1)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return jnp.sum(frames * mask[:, :, None], axis=1) / denom
    raise ValueError(f"unknown pooling method {method!r}")


def l2_normalize(x, axis, eps: float = 1e-6):
    """Gradient-safe L2 normalisation: x / max(||x||, eps) with the
    guard applied to the SQUARED norm, so exactly-zero rows get a zero
    (not NaN) gradient.

    `x / maximum(linalg.norm(x), eps)` is NaN-unsafe in reverse mode:
    d||x||/dx = x/||x|| is 0/0 at x == 0, and `maximum`'s zero cotangent
    still propagates 0 * NaN = NaN into the parameters. A NetVLAD
    cluster whose softmax assignment underflows to exact zeros across
    all frames produces such a row (observed: GatedNetVladModel NaN at
    step ~200 of the 50k soak). tf.nn.l2_normalize — the formulation the
    reference's VLAD models inherit — guards the squared norm for the
    same reason.
    """
    sum_sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sum_sq, eps * eps))
