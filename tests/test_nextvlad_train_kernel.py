"""Fused NeXtVLAD TRAIN core (kernels/nextvlad_train.py): custom-VJP
gradients vs jax.grad of the jnp oracle, plus model-level proof that
the train path dispatches to the kernel and matches the XLA path.

Runs in Pallas interpret mode on CPU (on-chip check:
scripts/validate_kernels_tpu.py)."""

import importlib

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


WEIGHT_ORDER = ("expand_w", "attn_w", "attn_b", "cluster_w", "centers")


@pytest.mark.parametrize("frames_dtype", ["uint8", "float32"])
@pytest.mark.parametrize(
    "d,lam,g,k",
    [
        (16, 2, 4, 12),   # heavy padding on both P and K
        (64, 2, 1, 128),  # exactly aligned, single group
        (96, 3, 2, 130),  # P=144 misaligned (like the reference's 288)
    ],
)
def test_train_core_grads_match_oracle(frames_dtype, d, lam, g, k):
    from yt8m_tpu.kernels.nextvlad import nextvlad_aggregate_reference
    from yt8m_tpu.kernels.nextvlad_train import nextvlad_aggregate_train

    rng = np.random.default_rng(17 + d + g + k)
    b, f = 3, 10
    if frames_dtype == "uint8":
        frames = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    else:
        frames = rng.normal(size=(b, f, d)).astype(np.float32)
    frames = jnp.asarray(frames)
    num_frames = jnp.asarray([10, 4, 1], jnp.int32)
    w = {kk: jnp.asarray(v) for kk, v in _weights(rng, d, lam, g, k).items()}
    p = lam * d // g
    cot = jnp.asarray(
        rng.normal(size=(b, k, p)).astype(np.float32)
    )

    from yt8m_tpu.data.quantize import DEQUANT_BIAS, DEQUANT_SCALE

    def loss_kernel(ws):
        y = nextvlad_aggregate_train(
            frames, num_frames, ws["expand_w"], ws["attn_w"],
            ws["attn_b"], ws["cluster_w"], ws["centers"], g,
            DEQUANT_SCALE, DEQUANT_BIAS, True, jnp.float32,
        )
        return jnp.sum(y * cot)

    def loss_oracle(ws):
        y = nextvlad_aggregate_reference(
            frames, num_frames, ws["expand_w"], ws["attn_w"],
            ws["attn_b"], ws["cluster_w"], ws["centers"], groups=g,
            dtype=jnp.float32,
        )
        return jnp.sum(y * cot)

    lk, gk = jax.value_and_grad(loss_kernel)(w)
    lo, go = jax.value_and_grad(loss_oracle)(w)
    assert float(lk) == pytest.approx(float(lo), rel=1e-4)
    for name in WEIGHT_ORDER:
        np.testing.assert_allclose(
            np.asarray(gk[name]), np.asarray(go[name]),
            rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name} (d={d},g={g},k={k})",
        )


def test_train_core_grads_bf16_class():
    """bf16 compute dtype: grads land within the bf16 class of the f32
    oracle (same tolerance family as the serving-kernel tests)."""
    from yt8m_tpu.kernels.nextvlad import nextvlad_aggregate_reference
    from yt8m_tpu.kernels.nextvlad_train import nextvlad_aggregate_train
    from yt8m_tpu.data.quantize import DEQUANT_BIAS, DEQUANT_SCALE

    rng = np.random.default_rng(5)
    d, lam, g, k = 32, 2, 4, 24
    b, f = 2, 8
    p = lam * d // g
    frames = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    num_frames = jnp.asarray([8, 3], jnp.int32)
    w = {kk: jnp.asarray(v) for kk, v in _weights(rng, d, lam, g, k).items()}
    cot = jnp.asarray(rng.normal(size=(b, k, p)).astype(np.float32))

    def loss_kernel(ws):
        y = nextvlad_aggregate_train(
            frames, num_frames, ws["expand_w"], ws["attn_w"],
            ws["attn_b"], ws["cluster_w"], ws["centers"], g,
            DEQUANT_SCALE, DEQUANT_BIAS, True, jnp.bfloat16,
        )
        return jnp.sum(y * cot)

    def loss_oracle(ws):
        y = nextvlad_aggregate_reference(
            frames, num_frames, ws["expand_w"], ws["attn_w"],
            ws["attn_b"], ws["cluster_w"], ws["centers"], groups=g,
            dtype=jnp.float32,
        )
        return jnp.sum(y * cot)

    gk = jax.grad(loss_kernel)(w)
    go = jax.grad(loss_oracle)(w)
    for name in WEIGHT_ORDER:
        a, o = np.asarray(gk[name]), np.asarray(go[name])
        denom = max(np.abs(o).max(), 1e-6)
        assert np.abs(a - o).max() / denom < 0.05, (
            f"{name}: bf16-class deviation too large"
        )


HP = ModelHParams(
    vocab_size=16,
    feature_dim=24,
    max_frames=10,
    compute_dtype="float32",
    moe_num_mixtures=2,
    nextvlad_groups=4,
    nextvlad_expansion=2,
    nextvlad_cluster_size=12,
    nextvlad_hidden_size=32,
    nextvlad_train_fused=True,
)

B, F, D, C = 4, 10, 24, 16


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, F, D)).astype(np.float32)
    num_frames = np.array([F, 3, 7, 1], dtype=np.int32)
    for i, nf in enumerate(num_frames):
        feats[i, nf:] = 0.0
    labels = (rng.random((B, C)) < 0.2).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(num_frames), jnp.asarray(labels)


def _loss_and_grads(hp, interpret_env, monkeypatch):
    if interpret_env:
        monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    else:
        monkeypatch.delenv("YT8M_PALLAS_INTERPRET", raising=False)
        monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    model = get_model("NeXtVladModel", hp)
    feats, num_frames, labels = _inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats, num_frames, train=False,
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, num_frames, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        preds = out["predictions"]
        eps = 1e-5
        pc = jnp.clip(preds, eps, 1.0 - eps)
        return -jnp.mean(
            labels * jnp.log(pc) + (1.0 - labels) * jnp.log(1.0 - pc)
        )

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), grads


def test_model_train_step_invokes_train_kernel(monkeypatch):
    """A train-mode forward+backward with --nextvlad_train_fused must
    call the custom-VJP core (and produce finite grads)."""
    mod = importlib.import_module("yt8m_tpu.kernels.nextvlad_train")
    real = mod.nextvlad_aggregate_train
    calls = []

    def counting(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(mod, "nextvlad_aggregate_train", counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    loss, grads = _loss_and_grads(HP, True, monkeypatch)
    assert calls, "train step never called nextvlad_aggregate_train"
    assert np.isfinite(loss)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_model_fused_train_matches_xla(monkeypatch):
    """Fused train path == XLA train path (loss and all grads)."""
    loss_k, grads_k = _loss_and_grads(HP, True, monkeypatch)
    loss_x, grads_x = _loss_and_grads(HP, False, monkeypatch)
    assert loss_k == pytest.approx(loss_x, rel=1e-4), (loss_k, loss_x)
    flat_k = jax.tree_util.tree_leaves_with_path(grads_k)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(grads_x))
    for path, gk in flat_k:
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(flat_x[path]),
            rtol=5e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
