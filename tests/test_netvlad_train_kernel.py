"""Trainable fused NetVLAD core: kernel == jnp oracle (forward and
gradients, interpret mode on CPU), plus model-level dispatch proof and
fused-vs-jnp train-step parity for the NetVLAD family and the
NetVLAD-LSTM flagship."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yt8m_tpu.kernels.netvlad_train import (
    netvlad_core,
    netvlad_core_reference,
)
from yt8m_tpu.models import ModelHParams, get_model

B, F, D, K, C = 3, 11, 16, 8, 12


def _core_inputs(seed=0):
    rng = np.random.default_rng(seed)
    act = rng.normal(size=(B, F, K)).astype(np.float32)
    x = rng.normal(size=(B, F, D)).astype(np.float32)
    nf = np.array([F, 4, 1], dtype=np.int32)
    centers = rng.normal(size=(K, D)).astype(np.float32)
    return (
        jnp.asarray(act), jnp.asarray(x), jnp.asarray(nf),
        jnp.asarray(centers),
    )


def test_core_forward_matches_oracle():
    act, x, nf, centers = _core_inputs()
    got = netvlad_core(act, x, nf, centers, True)
    want, _ = netvlad_core_reference(act, x, nf, centers)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


def test_core_gradients_match_autodiff():
    act, x, nf, centers = _core_inputs(1)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(K, D)).astype(np.float32)
    )

    def loss_kernel(act, x, centers):
        v = netvlad_core(act, x, nf, centers, True)
        return jnp.sum(v * w)

    def loss_ref(act, x, centers):
        v, _ = netvlad_core_reference(act, x, nf, centers)
        return jnp.sum(v * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(act, x, centers)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(act, x, centers)
    for name, a, b in zip(("dact", "dx", "dcenters"), gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3,
            err_msg=name,
        )


HP = ModelHParams(
    vocab_size=C,
    feature_dim=D,
    max_frames=F,
    compute_dtype="float32",
    moe_num_mixtures=2,
    netvlad_cluster_size=K,
    netvlad_hidden_size=16,
    netvlad_fused_train=True,  # default is off (see hparams.py rationale)
    lstm_cells=16,
    lstm_layers=1,
)


def _model_inputs(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, F, D)).astype(np.float32)
    nf = np.array([F, 4, 1], dtype=np.int32)
    for i, n in enumerate(nf):
        feats[i, n:] = 0.0
    labels = (rng.random((B, C)) < 0.2).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(nf), jnp.asarray(labels)


def _train_loss_and_grads(model_name, fused, monkeypatch):
    if fused:
        monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
        monkeypatch.delenv("YT8M_DISABLE_PALLAS", raising=False)
    else:
        monkeypatch.delenv("YT8M_PALLAS_INTERPRET", raising=False)
        monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    model = get_model(model_name, HP)
    feats, nf, labels = _model_inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats, nf, train=False,
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, **{
                k: v for k, v in variables.items() if k != "params"
            }},
            feats, nf, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        preds = jnp.clip(out["predictions"], 1e-5, 1 - 1e-5)
        return -jnp.mean(
            labels * jnp.log(preds)
            + (1.0 - labels) * jnp.log(1.0 - preds)
        )

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), grads


@pytest.mark.parametrize(
    "model_name", ["NetVladModel", "GatedNetVladModel", "NetVladLstmModel"]
)
def test_model_train_dispatches_to_fused_core(model_name, monkeypatch):
    import yt8m_tpu.kernels.netvlad_train as mod

    real = mod.netvlad_core
    calls = []

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mod, "netvlad_core", counting)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    loss, grads = _train_loss_and_grads(model_name, True, monkeypatch)
    assert calls, f"{model_name} train step never called netvlad_core"
    assert np.isfinite(loss)
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


@pytest.mark.parametrize(
    "model_name", ["NetVladModel", "NetVladLstmModel"]
)
def test_fused_train_matches_jnp_path(model_name, monkeypatch):
    loss_k, grads_k = _train_loss_and_grads(model_name, True, monkeypatch)
    loss_j, grads_j = _train_loss_and_grads(model_name, False, monkeypatch)
    assert loss_k == pytest.approx(loss_j, rel=2e-2), (loss_k, loss_j)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(grads_j))
    for path, gk in jax.tree_util.tree_leaves_with_path(grads_k):
        gj = flat_j[path]
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gj), rtol=6e-2, atol=6e-3,
            err_msg=f"{model_name} {jax.tree_util.keystr(path)}",
        )
