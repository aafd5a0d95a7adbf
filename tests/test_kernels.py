"""Pallas kernel == jnp oracle equivalence (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yt8m_tpu.kernels.dequant_matmul import (
    dequant_affine_matmul,
    dequant_affine_matmul_reference,
)


@pytest.mark.parametrize(
    "m,d,n", [(64, 128, 128), (100, 256, 200), (256, 1152, 512)]
)
def test_dequant_affine_matmul_matches_reference(m, d, n):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(m, d), dtype=np.uint8)
    w = rng.normal(0, 0.05, size=(d, n)).astype(np.float32)
    scale = rng.normal(1.0, 0.1, size=(d,)).astype(np.float32)
    bias = rng.normal(0.0, 0.1, size=(d,)).astype(np.float32)

    got = dequant_affine_matmul(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
        jnp.asarray(bias), interpret=True,
    )
    want = dequant_affine_matmul_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias)
    )
    # The oracle mirrors the kernel's MXU dtype (bf16 for d >= 512), so the
    # two only differ by accumulation order.
    scale_mag = float(np.abs(np.asarray(want)).max()) or 1.0
    np.testing.assert_allclose(
        np.asarray(got) / scale_mag, np.asarray(want) / scale_mag, atol=5e-3
    )


@pytest.mark.parametrize("dtype", ["uint8", "float32"])
def test_netvlad_aggregate_matches_reference(dtype):
    from yt8m_tpu.kernels.netvlad import (
        netvlad_aggregate,
        netvlad_aggregate_reference,
    )

    rng = np.random.default_rng(2)
    b, f, d, k = 3, 20, 128, 128
    if dtype == "uint8":
        frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    else:
        frames = rng.normal(size=(b, f, d)).astype(np.float32)
    num_frames = np.array([20, 7, 1], np.int32)
    wc = rng.normal(0, 0.1, size=(d, k)).astype(np.float32)
    scale = rng.normal(1, 0.05, size=(k,)).astype(np.float32)
    bias = rng.normal(0, 0.05, size=(k,)).astype(np.float32)
    centers = rng.normal(0, 0.1, size=(k, d)).astype(np.float32)

    got = netvlad_aggregate(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(wc),
        jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(centers),
        interpret=True,
    )
    want = netvlad_aggregate_reference(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(wc),
        jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(centers),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-3
    )
    # Output is L2-normalised per video.
    norms = np.linalg.norm(np.asarray(got).reshape(b, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_netvlad_kernel_padded_frames_invariant():
    from yt8m_tpu.kernels.netvlad import netvlad_aggregate

    rng = np.random.default_rng(3)
    b, f, d, k = 2, 16, 128, 128
    frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    num_frames = np.array([5, 9], np.int32)
    wc = rng.normal(0, 0.1, size=(d, k)).astype(np.float32)
    ones = np.ones((k,), np.float32)
    zeros = np.zeros((k,), np.float32)
    centers = rng.normal(0, 0.1, size=(k, d)).astype(np.float32)
    out1 = netvlad_aggregate(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(wc),
        jnp.asarray(ones), jnp.asarray(zeros), jnp.asarray(centers),
        interpret=True,
    )
    corrupted = frames.copy()
    for i, nf in enumerate(num_frames):
        corrupted[i, nf:] = 255
    out2 = netvlad_aggregate(
        jnp.asarray(corrupted), jnp.asarray(num_frames), jnp.asarray(wc),
        jnp.asarray(ones), jnp.asarray(zeros), jnp.asarray(centers),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=1e-5
    )


@pytest.mark.parametrize("dtype", ["uint8", "float32"])
def test_attention_pool_matches_reference(dtype):
    from yt8m_tpu.kernels.attention_pool import (
        attention_pool,
        attention_pool_reference,
    )

    rng = np.random.default_rng(4)
    b, f, d, h = 3, 19, 128, 8
    if dtype == "uint8":
        frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    else:
        frames = rng.normal(size=(b, f, d)).astype(np.float32)
    num_frames = np.array([19, 6, 1], np.int32)
    query = rng.normal(0, 0.1, size=(d, h)).astype(np.float32)
    got = attention_pool(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(query),
        interpret=True,
    )
    want = attention_pool_reference(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(query)
    )
    scale_mag = float(np.abs(np.asarray(want)).max()) or 1.0
    np.testing.assert_allclose(
        np.asarray(got) / scale_mag, np.asarray(want) / scale_mag, atol=2e-2
    )


def test_attention_pool_padded_frames_invariant():
    from yt8m_tpu.kernels.attention_pool import attention_pool

    rng = np.random.default_rng(5)
    b, f, d, h = 2, 16, 128, 4
    frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    num_frames = np.array([4, 11], np.int32)
    query = rng.normal(0, 0.1, size=(d, h)).astype(np.float32)
    out1 = attention_pool(
        jnp.asarray(frames), jnp.asarray(num_frames), jnp.asarray(query),
        interpret=True,
    )
    corrupted = frames.copy()
    for i, nf in enumerate(num_frames):
        corrupted[i, nf:] = 255
    out2 = attention_pool(
        jnp.asarray(corrupted), jnp.asarray(num_frames), jnp.asarray(query),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=1e-5
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_recurrence_matches_scan(reverse):
    from yt8m_tpu.kernels.lstm import (
        lstm_recurrence,
        lstm_recurrence_reference,
    )

    rng = np.random.default_rng(6)
    f, b, h = 12, 8, 128
    g = 4 * h
    xp = rng.normal(0, 0.5, size=(f, b, g)).astype(np.float32)
    nf = np.array([12, 5, 1, 12, 7, 3, 9, 2], np.int32)
    wh = rng.normal(0, 0.1, size=(h, g)).astype(np.float32)
    bias = rng.normal(0, 0.05, size=(g,)).astype(np.float32)

    outs, (fc, fh) = lstm_recurrence(
        jnp.asarray(xp), jnp.asarray(nf), jnp.asarray(wh),
        jnp.asarray(bias), reverse=reverse, interpret=True,
    )
    outs_r, (fc_r, fh_r) = lstm_recurrence_reference(
        jnp.asarray(xp), jnp.asarray(nf), jnp.asarray(wh),
        jnp.asarray(bias), reverse=reverse,
    )
    np.testing.assert_allclose(
        np.asarray(outs), np.asarray(outs_r), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(fh), np.asarray(fh_r), atol=2e-2)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc_r), atol=2e-2)
    # Final state must equal the output at the last processed LIVE step:
    # forward = frame nf-1; reverse = flipped position f-1 (orig frame 0).
    for row, n in enumerate(nf):
        t = (f - 1) if reverse else (int(n) - 1)
        np.testing.assert_allclose(
            np.asarray(fh)[row], np.asarray(outs)[t, row], atol=2e-2
        )


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_recurrence_matches_scan(reverse):
    from yt8m_tpu.kernels.gru import (
        gru_recurrence,
        gru_recurrence_reference,
    )

    rng = np.random.default_rng(7)
    f, b, h = 10, 8, 128
    xg = rng.normal(0, 0.5, size=(f, b, 2 * h)).astype(np.float32)
    xc = rng.normal(0, 0.5, size=(f, b, h)).astype(np.float32)
    nf = np.array([10, 4, 1, 10, 6, 2, 8, 3], np.int32)
    whg = rng.normal(0, 0.1, size=(h, 2 * h)).astype(np.float32)
    whc = rng.normal(0, 0.1, size=(h, h)).astype(np.float32)
    bg = np.ones((2 * h,), np.float32)
    bc = np.zeros((h,), np.float32)

    outs, fh = gru_recurrence(
        jnp.asarray(xg), jnp.asarray(xc), jnp.asarray(nf),
        jnp.asarray(whg), jnp.asarray(whc), jnp.asarray(bg),
        jnp.asarray(bc), reverse=reverse, interpret=True,
    )
    outs_r, fh_r = gru_recurrence_reference(
        jnp.asarray(xg), jnp.asarray(xc), jnp.asarray(nf),
        jnp.asarray(whg), jnp.asarray(whc), jnp.asarray(bg),
        jnp.asarray(bc), reverse=reverse,
    )
    np.testing.assert_allclose(
        np.asarray(outs), np.asarray(outs_r), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(fh), np.asarray(fh_r), atol=2e-2)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_trainable_gradients_match_scan_autodiff(reverse):
    """custom-VJP kernel grads == jax.grad through the scan oracle."""
    import jax as _jax

    from yt8m_tpu.kernels.lstm import lstm_recurrence_reference
    from yt8m_tpu.kernels.lstm_train import lstm_recurrence_trainable

    rng = np.random.default_rng(8)
    f, b, h = 6, 8, 128
    g = 4 * h
    xp = jnp.asarray(rng.normal(0, 0.5, size=(f, b, g)).astype(np.float32))
    nf = jnp.asarray(np.array([6, 2, 1, 6, 4, 3, 5, 2], np.int32))
    wh = jnp.asarray(rng.normal(0, 0.1, size=(h, g)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.05, size=(g,)).astype(np.float32))
    # Fixed random projections make the scalar loss sensitive to every
    # output (outs, fc, fh).
    wo = jnp.asarray(rng.normal(size=(f, b, h)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))

    def loss_kernel(xp, wh, bias):
        outs, (fc, fh) = lstm_recurrence_trainable(
            xp, nf, wh, bias, reverse, 128, True
        )
        return (
            jnp.sum(outs * wo) + jnp.sum(fc * wf) + 2.0 * jnp.sum(fh * wf)
        )

    def loss_ref(xp, wh, bias):
        outs, (fc, fh) = lstm_recurrence_reference(
            xp, nf, wh, bias, reverse=reverse
        )
        return (
            jnp.sum(outs * wo) + jnp.sum(fc * wf) + 2.0 * jnp.sum(fh * wf)
        )

    val_k, grads_k = _jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(
        xp, wh, bias
    )
    val_r, grads_r = _jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        xp, wh, bias
    )
    assert np.allclose(float(val_k), float(val_r), rtol=2e-2, atol=1e-2)
    for gk, gr, name in zip(grads_k, grads_r, ["dx", "dwh", "dbias"]):
        gk, gr = np.asarray(gk), np.asarray(gr)
        scale = np.abs(gr).max() or 1.0
        np.testing.assert_allclose(
            gk / scale, gr / scale, atol=3e-2, err_msg=name
        )


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_trainable_gradients_match_scan_autodiff(reverse):
    """custom-VJP GRU kernel grads == jax.grad through the scan oracle."""
    import jax as _jax

    from yt8m_tpu.kernels.gru import gru_recurrence_reference
    from yt8m_tpu.kernels.gru_train import gru_recurrence_trainable

    rng = np.random.default_rng(9)
    f, b, h = 6, 8, 128
    xg = jnp.asarray(
        rng.normal(0, 0.5, size=(f, b, 2 * h)).astype(np.float32)
    )
    xc = jnp.asarray(
        rng.normal(0, 0.5, size=(f, b, h)).astype(np.float32)
    )
    nf = jnp.asarray(np.array([6, 2, 1, 6, 4, 3, 5, 2], np.int32))
    whg = jnp.asarray(
        rng.normal(0, 0.1, size=(h, 2 * h)).astype(np.float32)
    )
    whc = jnp.asarray(rng.normal(0, 0.1, size=(h, h)).astype(np.float32))
    bg = jnp.asarray(np.ones((2 * h,), np.float32))
    bc = jnp.asarray(np.zeros((h,), np.float32))
    wo = jnp.asarray(rng.normal(size=(f, b, h)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))

    def loss_kernel(xg, xc, whg, whc, bg, bc):
        outs, fh = gru_recurrence_trainable(
            xg, xc, nf, whg, whc, bg, bc, reverse, 128, True
        )
        return jnp.sum(outs * wo) + 2.0 * jnp.sum(fh * wf)

    def loss_ref(xg, xc, whg, whc, bg, bc):
        outs, fh = gru_recurrence_reference(
            xg, xc, nf, whg, whc, bg, bc, reverse=reverse
        )
        return jnp.sum(outs * wo) + 2.0 * jnp.sum(fh * wf)

    args = (xg, xc, whg, whc, bg, bc)
    val_k, grads_k = _jax.value_and_grad(
        loss_kernel, argnums=tuple(range(6))
    )(*args)
    val_r, grads_r = _jax.value_and_grad(
        loss_ref, argnums=tuple(range(6))
    )(*args)
    assert np.allclose(float(val_k), float(val_r), rtol=2e-2, atol=1e-2)
    names = ["dxg", "dxc", "dwhg", "dwhc", "dbg", "dbc"]
    for gk, gr, name in zip(grads_k, grads_r, names):
        gk, gr = np.asarray(gk), np.asarray(gr)
        scale = np.abs(gr).max() or 1.0
        np.testing.assert_allclose(
            gk / scale, gr / scale, atol=3e-2, err_msg=name
        )


def test_dequant_matches_yt8m_dequantize_semantics():
    """scale/bias = plain YT-8M dequantize -> kernel == dequantize+matmul."""
    from yt8m_tpu.data.quantize import dequantize

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(32, 128), dtype=np.uint8)
    w = rng.normal(0, 0.1, size=(128, 128)).astype(np.float32)
    scalar = 4.0 / 255.0
    b = 4.0 / 512.0 - 2.0
    got = dequant_affine_matmul(
        jnp.asarray(x),
        jnp.asarray(w),
        jnp.full((128,), scalar, jnp.float32),
        jnp.full((128,), b, jnp.float32),
        interpret=True,
    )
    want = jnp.dot(jnp.asarray(dequantize(x.astype(np.float32))), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
