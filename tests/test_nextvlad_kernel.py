"""Fused NeXtVLAD aggregation kernel (kernels/nextvlad.py) vs the jnp
oracle and the model's XLA path (interpret mode; on-chip check in
scripts/validate_kernels_tpu.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yt8m_tpu.models import ModelHParams, get_model  # noqa: E402


def _weights(rng, d, lam, g, k):
    de = lam * d
    p = de // g
    return dict(
        expand_w=rng.normal(0, 0.1, (d, de)).astype(np.float32),
        attn_w=rng.normal(0, 0.1, (de, g)).astype(np.float32),
        attn_b=rng.normal(0, 0.05, (g,)).astype(np.float32),
        cluster_w=rng.normal(0, 0.1, (de, g * k)).astype(np.float32),
        centers=rng.normal(0, 0.1, (k, p)).astype(np.float32),
    )


@pytest.mark.parametrize("dtype", ["uint8", "float32"])
@pytest.mark.parametrize(
    "d,lam,g,k",
    [
        (16, 2, 4, 12),   # P=8 -> Pp=128, K=12 -> Kp=128 (heavy padding)
        (64, 2, 1, 128),  # P=128, K=128 exactly aligned; single group
        (32, 1, 16, 96),  # lam=1, many groups, tiny P=2, K pad 96->128
        (96, 3, 2, 130),  # P=144 misaligned (like the reference's 288),
                          # K=130 > one lane tile -> Kp=256
    ],
)
def test_nextvlad_aggregate_matches_reference(dtype, d, lam, g, k):
    from yt8m_tpu.kernels.nextvlad import (
        nextvlad_aggregate,
        nextvlad_aggregate_reference,
    )

    rng = np.random.default_rng(d + g + k)
    b, f = 3, 10
    if dtype == "uint8":
        frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    else:
        frames = rng.normal(size=(b, f, d)).astype(np.float32)
    num_frames = np.array([10, 4, 1], np.int32)
    w = {kk: jnp.asarray(v) for kk, v in _weights(rng, d, lam, g, k).items()}

    got = nextvlad_aggregate(
        jnp.asarray(frames), jnp.asarray(num_frames), w["expand_w"],
        w["attn_w"], w["attn_b"], w["cluster_w"], w["centers"],
        groups=g, interpret=True,
    )
    want = nextvlad_aggregate_reference(
        jnp.asarray(frames), jnp.asarray(num_frames), w["expand_w"],
        w["attn_w"], w["attn_b"], w["cluster_w"], w["centers"],
        groups=g,
    )
    assert got.shape == want.shape == (b, k, lam * d // g)
    got_np, want_np = np.asarray(got), np.asarray(want)
    # Post-normalisation rows with a TINY pre-norm magnitude amplify
    # bf16 reduction-order noise into visible direction shifts (seen at
    # P=2). ONLY such rows may fall back to an angular tolerance; rows
    # with a healthy pre-norm magnitude must match elementwise, so a
    # genuine kernel regression (e.g. a wrong group-slice offset) still
    # fails.
    prenorm = np.linalg.norm(
        np.asarray(
            nextvlad_aggregate_reference(
                jnp.asarray(frames), jnp.asarray(num_frames),
                w["expand_w"], w["attn_w"], w["attn_b"],
                w["cluster_w"], w["centers"], groups=g,
                normalize=False,
            )
        ),
        axis=2,
    )
    tiny = prenorm < 0.05
    rowbad = np.abs(got_np - want_np).max(axis=2) > 5e-3
    assert not (rowbad & ~tiny).any(), (
        f"{(rowbad & ~tiny).sum()} healthy-magnitude rows diverge "
        "elementwise"
    )
    if rowbad.any():
        # want is unit-norm on these rows (guard before using raw dot
        # as cosine), and the directions must stay near-parallel.
        wn = np.linalg.norm(want_np[rowbad], axis=-1)
        np.testing.assert_allclose(wn, 1.0, atol=1e-4)
        cos = np.sum(got_np[rowbad] * want_np[rowbad], axis=-1)
        assert np.all(cos > 0.99), "tiny rows diverge beyond angle"
    np.testing.assert_allclose(
        got_np[~rowbad], want_np[~rowbad], atol=5e-3
    )
    # Intra-normalised rows: unit norm unless the row was exactly zero.
    norms = np.linalg.norm(got_np, axis=2)
    assert np.all((np.abs(norms - 1.0) < 1e-4) | (norms < 1e-3))


def test_nextvlad_kernel_padded_frames_invariant():
    """Frames beyond num_frames must not affect the descriptor (the
    kernel masks rows, including the Fp alignment pad)."""
    from yt8m_tpu.kernels.nextvlad import nextvlad_aggregate

    rng = np.random.default_rng(7)
    d, lam, g, k = 16, 2, 4, 12
    w = {kk: jnp.asarray(v) for kk, v in _weights(rng, d, lam, g, k).items()}
    base = rng.integers(0, 256, size=(2, 6, d), dtype=np.uint8)
    nf = np.array([6, 3], np.int32)

    out1 = nextvlad_aggregate(
        jnp.asarray(base), jnp.asarray(nf), w["expand_w"], w["attn_w"],
        w["attn_b"], w["cluster_w"], w["centers"], groups=g,
        interpret=True,
    )
    junk = base.copy()
    junk[1, 3:] = 255  # beyond num_frames of video 1
    padded = np.concatenate(
        [junk, rng.integers(0, 256, size=(2, 5, d), dtype=np.uint8)],
        axis=1,
    )
    out2 = nextvlad_aggregate(
        jnp.asarray(padded), jnp.asarray(nf), w["expand_w"], w["attn_w"],
        w["attn_b"], w["cluster_w"], w["centers"], groups=g,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=1e-5
    )


HP = ModelHParams(
    vocab_size=20, feature_dim=16, max_frames=10,
    nextvlad_groups=4, nextvlad_expansion=2, nextvlad_cluster_size=12,
    nextvlad_hidden_size=24, moe_num_mixtures=2,
)


def _model_run(variables, feats, nf):
    model = get_model("NeXtVladModel", HP)
    out = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    return np.asarray(out["predictions"])


def test_model_fused_matches_plain(monkeypatch):
    rng = np.random.default_rng(3)
    feats = rng.integers(0, 256, size=(3, 10, 16), dtype=np.uint8)
    nf = np.array([10, 5, 2], np.int32)
    model = get_model("NeXtVladModel", HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    fused = _model_run(variables, feats, nf)
    monkeypatch.delenv("YT8M_PALLAS_INTERPRET")
    monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    plain = _model_run(variables, feats, nf)
    np.testing.assert_allclose(fused, plain, rtol=3e-2, atol=3e-3)


def test_model_fused_dispatch_called(monkeypatch):
    import yt8m_tpu.kernels.nextvlad as mod

    real = mod.nextvlad_aggregate
    calls = []

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mod, "nextvlad_aggregate", counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(4)
    feats = rng.integers(0, 256, size=(2, 10, 16), dtype=np.uint8)
    nf = np.full((2,), 10, np.int32)
    model = get_model("NeXtVladModel", HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )
    model.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert calls, "fused NeXtVLAD kernel was not dispatched"
    # and the opt-out flag really opts out
    calls.clear()
    hp = HP.replace(nextvlad_use_pallas=False)
    model2 = get_model("NeXtVladModel", hp)
    model2.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert not calls
