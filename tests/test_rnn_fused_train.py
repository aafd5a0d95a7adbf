"""Model-level proof that RNN TRAINING dispatches to the fused
custom-VJP Pallas recurrences (kernels/lstm_train.py, gru_train.py),
and that the fused train path matches the lax.scan path in both loss
and gradients.

Runs the real kernels in Pallas interpret mode on CPU via the
YT8M_PALLAS_INTERPRET hook (the dispatch condition in models/rnn.py is
`backend == "tpu" or interpret_forced`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yt8m_tpu.models import ModelHParams, get_model

B, F, D, C = 4, 10, 24, 16

HP = ModelHParams(
    vocab_size=C,
    feature_dim=D,
    max_frames=F,
    compute_dtype="float32",
    moe_num_mixtures=2,
    lstm_cells=16,
    lstm_layers=1,
    gru_cells=16,
    gru_layers=1,
)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, F, D)).astype(np.float32)
    num_frames = np.array([F, 3, 7, 1], dtype=np.int32)
    for i, nf in enumerate(num_frames):
        feats[i, nf:] = 0.0
    labels = (rng.random((B, C)) < 0.2).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(num_frames), jnp.asarray(labels)


def _loss_and_grads(model_name, hp, interpret_env, monkeypatch):
    if interpret_env:
        monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    else:
        monkeypatch.delenv("YT8M_PALLAS_INTERPRET", raising=False)
        # Force the scan path off-TPU by disabling kernels entirely.
        monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    model = get_model(model_name, hp)
    feats, num_frames, labels = _inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats,
        num_frames,
        train=False,
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params},
            feats,
            num_frames,
            train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        preds = out["predictions"]
        eps = 1e-5
        p = jnp.clip(preds, eps, 1.0 - eps)
        return -jnp.mean(
            labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p)
        )

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), grads


@pytest.mark.parametrize("model_name,kernel_mod,kernel_fn", [
    ("GruModel", "yt8m_tpu.kernels.gru_train", "gru_recurrence_trainable"),
    ("BiGruModel", "yt8m_tpu.kernels.gru_train", "gru_recurrence_trainable"),
    ("LstmModel", "yt8m_tpu.kernels.lstm_train",
     "lstm_recurrence_trainable"),
])
def test_train_step_invokes_trainable_kernel(
    model_name, kernel_mod, kernel_fn, monkeypatch
):
    """A train-mode forward+backward must call the custom-VJP kernel
    (regression for the dead `not train` guard in _GruLayer)."""
    import importlib

    mod = importlib.import_module(kernel_mod)
    real = getattr(mod, kernel_fn)
    calls = []

    def counting(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(mod, kernel_fn, counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")

    model = get_model(model_name, HP)
    feats, num_frames, labels = _inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats,
        num_frames,
        train=False,
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params}, feats, num_frames, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out["predictions"])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert calls, f"{model_name} train step never called {kernel_fn}"
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


@pytest.mark.parametrize("model_name", ["GruModel", "LstmModel", "BiGruModel"])
def test_fused_train_matches_scan(model_name, monkeypatch):
    """Fused custom-VJP train path == lax.scan path (loss and grads)."""
    loss_k, grads_k = _loss_and_grads(model_name, HP, True, monkeypatch)
    loss_s, grads_s = _loss_and_grads(model_name, HP, False, monkeypatch)
    assert loss_k == pytest.approx(loss_s, rel=2e-2), (loss_k, loss_s)
    flat_k = jax.tree_util.tree_leaves_with_path(grads_k)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(grads_s))
    for path, gk in flat_k:
        gs = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gs), rtol=5e-2, atol=5e-3,
            err_msg=f"{model_name} grad mismatch at {jax.tree_util.keystr(path)}",
        )
