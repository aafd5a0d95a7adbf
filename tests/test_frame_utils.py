"""Frame sampling/pooling semantics (reference: model_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    frame_pooling,
    sample_random_frames,
    sample_random_sequence,
)


def test_sample_random_frames_stays_in_valid_range():
    rng = jax.random.PRNGKey(0)
    b, f, d, s = 8, 30, 4, 64
    x = jnp.tile(
        jnp.arange(f, dtype=jnp.float32)[None, :, None], (b, 1, d)
    )
    nf = jnp.asarray(np.array([30, 1, 5, 17, 30, 2, 9, 3], np.int32))
    out = sample_random_frames(rng, x, nf, s)
    assert out.shape == (b, s, d)
    sampled_idx = np.asarray(out[:, :, 0]).astype(int)
    for row, n in enumerate(np.asarray(nf)):
        assert sampled_idx[row].max() < n  # never samples padding
        assert sampled_idx[row].min() >= 0


def test_sample_random_sequence_contiguous():
    rng = jax.random.PRNGKey(1)
    b, f, d, s = 4, 40, 2, 8
    x = jnp.tile(
        jnp.arange(f, dtype=jnp.float32)[None, :, None], (b, 1, d)
    )
    nf = jnp.asarray(np.array([40, 12, 8, 3], np.int32))
    out = sample_random_sequence(rng, x, nf, s)
    idx = np.asarray(out[:, :, 0]).astype(int)
    for row, n in enumerate(np.asarray(nf)):
        diffs = np.diff(idx[row])
        # contiguous until clipped at the last valid frame
        assert np.all((diffs == 1) | (diffs == 0))
        assert idx[row].max() <= max(n - 1, 0)


def test_frame_pooling_masked():
    x = jnp.asarray(
        np.array(
            [[[1.0], [5.0], [100.0]], [[2.0], [-3.0], [-100.0]]],
            np.float32,
        )
    )
    mask = jnp.asarray(np.array([[1, 1, 0], [1, 1, 0]], np.float32))
    np.testing.assert_allclose(
        np.asarray(frame_pooling(x, "max", mask))[:, 0], [5.0, 2.0]
    )
    np.testing.assert_allclose(
        np.asarray(frame_pooling(x, "average", mask))[:, 0], [3.0, -0.5]
    )


def test_ensure_float_dequantizes_uint8():
    u8 = jnp.asarray(np.array([0, 128, 255], np.uint8))
    out = np.asarray(ensure_float(u8))
    expected = np.array([0, 128, 255]) * (4.0 / 255.0) + (
        4.0 / 512.0 - 2.0
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)
    f32 = jnp.asarray(np.array([1.5], np.float32))
    assert ensure_float(f32) is f32  # passthrough, no copy


def test_frame_mask():
    m = np.asarray(frame_mask(jnp.asarray(np.array([0, 2, 5])), 4))
    np.testing.assert_array_equal(
        m, [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]]
    )


def test_sample_random_sequence_reaches_last_window():
    """start must be uniform over {0, .., num_frames - num_samples}
    INCLUDING the final window (ADVICE r1: the old scale of
    max(nf - s, 1) never selected it)."""
    import jax

    nf_val, s = 31, 30
    x = jnp.arange(40, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, 2))
    nf = jnp.array([nf_val], dtype=jnp.int32)
    starts = set()
    for seed in range(64):
        out = sample_random_sequence(jax.random.PRNGKey(seed), x, nf, s)
        starts.add(int(out[0, 0, 0]))
    # both windows {0, 1} must be reachable
    assert starts == {0, 1}, starts


def test_sample_random_sequence_short_video_repeats_last_frame():
    import jax

    x = jnp.arange(10, dtype=jnp.float32)[None, :, None]
    nf = jnp.array([3], dtype=jnp.int32)
    out = sample_random_sequence(jax.random.PRNGKey(0), x, nf, 6)
    vals = np.asarray(out[0, :, 0])
    assert vals[0] == 0.0 and np.all(vals <= 2.0)
    assert vals[-1] == 2.0  # clipped to the last real frame


def test_l2_normalize_zero_row_safe_value_and_grad():
    """Regression: `v / maximum(linalg.norm(v), eps)` has a NaN reverse-mode
    gradient at an exactly-zero row (0/0 inside d||v||/dv survives the
    maximum's zero cotangent as 0*NaN). Observed in the wild: a NetVLAD
    cluster whose softmax assignment underflows to exact zeros NaN'd
    GatedNetVladModel at step ~200 of the 50k soak."""
    from yt8m_tpu.models.frame_utils import l2_normalize

    v = jnp.zeros((3, 4)).at[0, 1].set(2.0).at[2, 0].set(-0.5)
    out = l2_normalize(v, axis=-1)
    # Non-zero rows: unit norm, same direction as v/||v||.
    np.testing.assert_allclose(np.asarray(out[0]), [0, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), [-1, 0, 0, 0], atol=1e-6)
    # Zero row: zero output, not NaN.
    assert np.all(np.asarray(out[1]) == 0.0)
    g = jax.grad(lambda v: jnp.sum(l2_normalize(v, axis=-1) ** 2))(v)
    assert np.all(np.isfinite(np.asarray(g)))
