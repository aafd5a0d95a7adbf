"""Fused DBoF cluster+maxpool kernel: == jnp oracle (interpret mode),
plus model-level fused-inference parity for the DBoF family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yt8m_tpu.kernels.dbof import (
    dbof_cluster_maxpool,
    dbof_cluster_maxpool_reference,
    dbof_cluster_maxpool_v2,
    dbof_sampled_cluster_maxpool,
)
from yt8m_tpu.models import ModelHParams, get_model

B, S, D, K, C = 5, 6, 16, 8, 12


@pytest.mark.parametrize("variant", [dbof_cluster_maxpool,
                                     dbof_cluster_maxpool_v2])
@pytest.mark.parametrize("dtype", ["uint8", "float32"])
def test_kernel_matches_oracle(dtype, variant):
    rng = np.random.default_rng(0)
    if dtype == "uint8":
        x = rng.integers(0, 256, size=(B, S, D), dtype=np.uint8)
    else:
        x = rng.normal(size=(B, S, D)).astype(np.float32)
    w = rng.normal(size=(D, K)).astype(np.float32) * 0.1
    s_in = rng.uniform(0.5, 1.5, D).astype(np.float32)
    b_in = rng.normal(size=(D,)).astype(np.float32) * 0.1
    s_act = rng.uniform(0.5, 1.5, K).astype(np.float32)
    b_act = rng.normal(size=(K,)).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (x, w, s_in, b_in, s_act, b_act)))
    got = variant(*args, interpret=True, block_b=2)
    want = dbof_cluster_maxpool_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


def test_sampled_kernel_matches_gather_oracle():
    """Fused in-kernel one-hot gather == XLA gather + oracle."""
    rng = np.random.default_rng(5)
    b, f, d, s, k = 12, 40, 256, 7, 256
    x = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    idx = rng.integers(0, f, (b, s)).astype(np.int32)
    w = rng.normal(size=(d, k)).astype(np.float32) * 0.05
    s_in = rng.uniform(0.5, 1.5, d).astype(np.float32)
    b_in = rng.normal(size=(d,)).astype(np.float32) * 0.1
    s_act = rng.uniform(0.5, 1.5, k).astype(np.float32)
    b_act = rng.normal(size=(k,)).astype(np.float32) * 0.1
    got = dbof_sampled_cluster_maxpool(
        jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
        jnp.asarray(s_in), jnp.asarray(b_in), jnp.asarray(s_act),
        jnp.asarray(b_act), interpret=True, block_b=8, block_k=128,
    )
    x_sel = np.take_along_axis(x, idx[:, :, None], axis=1)
    want = dbof_cluster_maxpool_reference(
        jnp.asarray(x_sel).astype(jnp.float32), jnp.asarray(w),
        jnp.asarray(s_in), jnp.asarray(b_in), jnp.asarray(s_act),
        jnp.asarray(b_act),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


def test_kernel_k_tiling():
    """K > block_k exercises the (k, b) grid with W-tile revisiting."""
    rng = np.random.default_rng(1)
    k = 32
    x = rng.integers(0, 256, size=(4, 3, 8), dtype=np.uint8)
    w = rng.normal(size=(8, k)).astype(np.float32) * 0.1
    ones_d, zeros_d = np.ones(8, np.float32), np.zeros(8, np.float32)
    ones_k, zeros_k = np.ones(k, np.float32), np.zeros(k, np.float32)
    got = dbof_cluster_maxpool(
        jnp.asarray(x), jnp.asarray(w), ones_d, zeros_d, ones_k, zeros_k,
        interpret=True, block_b=4, block_k=16,
    )
    want = dbof_cluster_maxpool_reference(
        jnp.asarray(x), jnp.asarray(w), ones_d, zeros_d, ones_k, zeros_k
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


HP = ModelHParams(
    vocab_size=C,
    feature_dim=D,
    max_frames=10,
    compute_dtype="float32",
    moe_num_mixtures=2,
    dbof_cluster_size=K,
    dbof_hidden_size=8,
    iterations=S,
)


@pytest.mark.parametrize(
    "model_name", ["DbofModel", "GatedDbofModel"]
)
def test_model_fused_inference_matches_jnp(model_name, monkeypatch):
    rng = np.random.default_rng(2)
    feats = rng.integers(0, 256, size=(B, 10, D), dtype=np.uint8)
    nf = np.array([10, 3, 7, 1, 10], np.int32)
    model = get_model(model_name, HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )

    def run():
        out = model.apply(
            variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        return np.asarray(out["predictions"])

    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    fused = run()
    monkeypatch.delenv("YT8M_PALLAS_INTERPRET")
    monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    plain = run()
    np.testing.assert_allclose(fused, plain, rtol=3e-2, atol=3e-3)


def test_model_fused_dispatch_called(monkeypatch):
    import yt8m_tpu.kernels.dbof as mod

    real = mod.dbof_cluster_maxpool_v2
    calls = []

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mod, "dbof_cluster_maxpool_v2", counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    feats = rng.integers(0, 256, size=(B, 10, D), dtype=np.uint8)
    nf = np.full((B,), 10, np.int32)
    model = get_model("DbofModel", HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )
    model.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert calls, "inference never dispatched to dbof_cluster_maxpool_v2"


def test_train_path_unchanged_by_kernel_flag(monkeypatch):
    """TRAIN always uses the XLA graph (BN needs batch stats)."""
    import yt8m_tpu.kernels.dbof as mod

    calls = []
    monkeypatch.setattr(
        mod, "dbof_cluster_maxpool_v2",
        lambda *a, **kw: calls.append(1) or None,
    )
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(4)
    feats = rng.integers(0, 256, size=(B, 10, D), dtype=np.uint8)
    nf = np.full((B,), 10, np.int32)
    model = get_model("DbofModel", HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )
    model.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=True,
        rngs={"sample": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert not calls


def test_int8_kernel_close_to_oracle():
    """Opt-in int8 path: input-side math exact, only W quantization
    deviates — bounded relative to the activation scale."""
    rng = np.random.default_rng(7)
    b, s, d, k = 16, 7, 256, 256
    x = rng.integers(0, 256, size=(b, s, d), dtype=np.uint8)
    w = rng.normal(size=(d, k)).astype(np.float32) * 0.05
    s_in = rng.uniform(0.012, 0.018, d).astype(np.float32)
    b_in = rng.normal(-2, 0.1, d).astype(np.float32)
    s_act = rng.uniform(0.5, 1.5, k).astype(np.float32)
    b_act = rng.normal(0, 0.1, k).astype(np.float32)
    from yt8m_tpu.kernels.dbof import dbof_cluster_maxpool_int8

    got = dbof_cluster_maxpool_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s_in),
        jnp.asarray(b_in), jnp.asarray(s_act), jnp.asarray(b_act),
        interpret=True, block_b=8, block_k=128,
    )
    want = dbof_cluster_maxpool_reference(
        jnp.asarray(x).astype(jnp.float32), jnp.asarray(w),
        jnp.asarray(s_in), jnp.asarray(b_in), jnp.asarray(s_act),
        jnp.asarray(b_act),
    )
    scale = float(jnp.mean(jnp.abs(want))) + 1e-9
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.10, f"int8 deviation {err:.2%} of activation scale"


def test_int8_serving_flag_dispatches(monkeypatch):
    import yt8m_tpu.kernels.dbof as mod

    real = mod.dbof_cluster_maxpool_int8
    calls = []

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mod, "dbof_cluster_maxpool_int8", counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(8)
    feats = rng.integers(0, 256, size=(B, 10, D), dtype=np.uint8)
    nf = np.full((B,), 10, np.int32)
    hp8 = HP.replace(dbof_int8_serving=True)
    model = get_model("DbofModel", hp8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )
    out = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert calls, "int8 flag did not dispatch to the int8 kernel"
    preds = np.asarray(out["predictions"])
    assert np.all((preds >= 0) & (preds <= 1))


def test_model_fused_f32_matches_jnp_tightly(monkeypatch):
    """With --compute_dtype=float32 the fused serving path now computes
    in f32 (the kernel takes the model dtype), so it matches the jnp
    path to float tolerance — not just the loose bf16 bound above."""
    rng = np.random.default_rng(7)
    feats = rng.integers(0, 256, size=(B, 10, D), dtype=np.uint8)
    nf = np.array([10, 3, 7, 1, 10], np.int32)
    model = get_model("DbofModel", HP)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(feats), jnp.asarray(nf), train=False,
    )

    def run():
        out = model.apply(
            variables, jnp.asarray(feats), jnp.asarray(nf), train=False,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        return np.asarray(out["predictions"])

    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    fused = run()
    monkeypatch.delenv("YT8M_PALLAS_INTERPRET")
    monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    plain = run()
    np.testing.assert_allclose(fused, plain, rtol=1e-5, atol=1e-6)
