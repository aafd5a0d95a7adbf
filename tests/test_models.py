"""Model zoo unit tests: shapes, probability ranges, determinism, and
padded-frame invariance (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yt8m_tpu.models import ModelHParams, get_model, list_models
from yt8m_tpu.models.registry import is_frame_level_model

B, F, D, C = 4, 12, 40, 25

HP = ModelHParams(
    vocab_size=C,
    feature_dim=D,
    max_frames=F,
    compute_dtype="float32",
    moe_num_mixtures=2,
    dbof_cluster_size=32,
    dbof_hidden_size=16,
    iterations=6,
    netvlad_cluster_size=8,
    netvlad_hidden_size=16,
    attention_heads=2,
    attention_hidden_size=16,
    lstm_cells=16,
    lstm_layers=2,
    gru_cells=16,
    chain_stages=2,
    chain_hidden_size=16,
    nextvlad_groups=4,
    nextvlad_expansion=2,
    nextvlad_cluster_size=8,
    nextvlad_hidden_size=16,
    cnn_filters=16,
    cnn_layers=2,
    cnn_kernel=3,
)


def _make_inputs(frame_level, seed=0):
    rng = np.random.default_rng(seed)
    if frame_level:
        feats = rng.normal(size=(B, F, D)).astype(np.float32)
        num_frames = np.array([F, 3, 7, 1], dtype=np.int32)
        # zero out padding as the reader does
        for i, nf in enumerate(num_frames):
            feats[i, nf:] = 0.0
    else:
        feats = rng.normal(size=(B, D)).astype(np.float32)
        num_frames = np.ones((B,), dtype=np.int32)
    return jnp.asarray(feats), jnp.asarray(num_frames)


def _init_and_apply(model, feats, num_frames, train=False, seed=0):
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(1)},
        feats,
        num_frames,
        train=False,
    )
    out = model.apply(
        variables,
        feats,
        num_frames,
        train=train,
        rngs={"sample": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return out, variables


@pytest.mark.parametrize("name", list_models())
def test_forward_shapes_and_ranges(name):
    frame_level = is_frame_level_model(name)
    feats, num_frames = _make_inputs(frame_level)
    model = get_model(name, HP)
    out, _ = _init_and_apply(model, feats, num_frames)
    preds = np.asarray(out["predictions"])
    assert preds.shape == (B, C)
    assert preds.dtype == np.float32
    assert np.all(preds >= 0.0) and np.all(preds <= 1.0)
    assert np.all(np.isfinite(preds))


@pytest.mark.parametrize("name", list_models())
def test_forward_deterministic(name):
    frame_level = is_frame_level_model(name)
    feats, num_frames = _make_inputs(frame_level)
    model = get_model(name, HP)
    out1, variables = _init_and_apply(model, feats, num_frames)
    out2 = model.apply(
        variables, feats, num_frames, train=False,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    np.testing.assert_array_equal(
        np.asarray(out1["predictions"]), np.asarray(out2["predictions"])
    )


@pytest.mark.parametrize(
    "name", [n for n in list_models() if is_frame_level_model(n)]
)
def test_padded_frames_do_not_leak(name):
    """Garbage in padded frames must not change predictions (SURVEY.md §7
    hard part 4)."""
    feats, num_frames = _make_inputs(True)
    model = get_model(name, HP)
    out1, variables = _init_and_apply(model, feats, num_frames)

    corrupted = np.asarray(feats).copy()
    for i, nf in enumerate(np.asarray(num_frames)):
        corrupted[i, nf:] = 1e4  # garbage in the padding
    out2 = model.apply(
        variables, jnp.asarray(corrupted), num_frames, train=False,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(out1["predictions"]),
        np.asarray(out2["predictions"]),
        atol=1e-5,
    )


@pytest.mark.parametrize(
    "name", [n for n in list_models() if is_frame_level_model(n)]
)
def test_uint8_input_matches_prequantized_float(name):
    """Models accept raw uint8 features (on-device dequantize) and must
    match applying them to the dequantized float input."""
    from yt8m_tpu.data.quantize import dequantize

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(B, F, D), dtype=np.uint8)
    num_frames = jnp.asarray(np.array([F, 3, 7, 1], dtype=np.int32))
    f32 = dequantize(u8.astype(np.float32))
    model = get_model(name, HP)
    out_f, variables = _init_and_apply(model, jnp.asarray(f32), num_frames)
    out_u = model.apply(
        variables, jnp.asarray(u8), num_frames, train=False,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(out_f["predictions"]),
        np.asarray(out_u["predictions"]),
        atol=1e-5,
    )


def test_moe_gate_abstention_dims():
    """MoE head: (M+1) gates but only M experts contribute."""
    hp = HP.replace(moe_num_mixtures=3)
    feats, num_frames = _make_inputs(False)
    model = get_model("MoeModel", hp)
    _, variables = _init_and_apply(model, feats, num_frames)
    params = variables["params"]["tower"]
    assert params["gates_kernel"].shape == (D, C * 4)
    assert params["experts_kernel"].shape == (D, C * 3)


def test_layer_norm_lstm_params_and_flag_equivalence():
    """--lstm_layer_norm=true on LstmModel == LayerNormLstmModel, and the
    LN cell creates per-gate scale/shift params (fork variant,
    SURVEY.md §2.2 'layer-norm cells')."""
    feats, nf = _make_inputs(True)
    hp_ln = HP.replace(lstm_layer_norm=True)
    out_flag, vars_flag = _init_and_apply(
        get_model("LstmModel", hp_ln), feats, nf
    )
    out_named, _ = _init_and_apply(
        get_model("LayerNormLstmModel", HP), feats, nf
    )
    np.testing.assert_allclose(
        np.asarray(out_flag["predictions"]),
        np.asarray(out_named["predictions"]),
        rtol=1e-6,
    )
    layer0 = vars_flag["params"]["fw_layer0"]
    assert "ln_scale" in layer0 and layer0["ln_scale"].shape == (5, 16)
    preds = np.asarray(out_flag["predictions"])
    assert preds.shape == (B, C)
    assert np.all((preds >= 0) & (preds <= 1))


def test_residual_rnn_changes_output_and_keeps_masking():
    """--rnn_residual adds identity skips between stacked layers
    (SURVEY.md §2.2 'residual stacks'); padded frames still must not
    leak."""
    feats, nf = _make_inputs(True)
    hp_res = HP.replace(rnn_residual=True)
    out_res, _ = _init_and_apply(get_model("LstmModel", hp_res), feats, nf)
    out_plain, _ = _init_and_apply(get_model("LstmModel", HP), feats, nf)
    assert not np.allclose(
        np.asarray(out_res["predictions"]),
        np.asarray(out_plain["predictions"]),
    ), "residual flag had no effect"

    # mask invariance under residual stacking
    feats_garbage = np.asarray(feats).copy()
    rng = np.random.default_rng(9)
    for i, n in enumerate(np.asarray(nf)):
        feats_garbage[i, n:] = rng.normal(size=(F - n, D)) * 50
    model = get_model("LstmModel", hp_res)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats, nf, train=False,
    )
    a = model.apply(variables, feats, nf, train=False,
                    rngs={"sample": jax.random.PRNGKey(2)})
    b = model.apply(variables, jnp.asarray(feats_garbage), nf, train=False,
                    rngs={"sample": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(
        np.asarray(a["predictions"]), np.asarray(b["predictions"]),
        rtol=1e-5, atol=1e-6,
    )


def test_netvlad_saturated_softmax_grads_finite():
    """Regression for the 50k-soak NaN: saturated cluster logits make the
    softmax assignment exactly zero for most clusters, so whole VLAD rows
    are exactly zero; the intra-/global-L2 normalisation must still have
    finite gradients (models/frame_utils.py :: l2_normalize)."""
    import jax
    import jax.numpy as jnp

    from yt8m_tpu.models.netvlad import _NetVladAggregation

    b, f, d, k = 2, 6, 8, 16
    mod = _NetVladAggregation(
        cluster_size=k, add_batch_norm=False, use_pallas=False
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(b, f, d)), jnp.float32)
    nf = jnp.asarray([f, 3], jnp.int32)
    mask = jnp.asarray(
        (np.arange(f)[None, :] < np.asarray(nf)[:, None]), jnp.float32
    )
    variables = mod.init(jax.random.PRNGKey(0), feats, nf, mask, train=True)
    # Scale cluster logits so softmax saturates to exact one-hots.
    params = jax.tree_util.tree_map(
        lambda p: p * 1e4 if p.ndim == 2 else p, variables["params"]
    )

    def loss_fn(params):
        vlad, _ = mod.apply({"params": params}, feats, nf, mask, train=True)
        return jnp.sum(vlad**2)

    # Sanity: the saturation really produces exactly-zero VLAD rows.
    vlad, _ = mod.apply({"params": params}, feats, nf, mask, train=True)
    row_norms = np.asarray(jnp.sum(vlad.reshape(b, k, d) ** 2, axis=-1))
    assert (row_norms == 0.0).any(), "expected exact-zero VLAD rows"
    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
