"""Fused MoE-head serving kernel (kernels/moe_head.py) vs the jnp path.

Reference semantics: video_level_models.py :: MoeModel.create_model —
softmax gates over (M+1) per-class logits (dummy-expert abstention),
sigmoid experts, mixture-weighted sum.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yt8m_tpu.kernels.moe_head import moe_head_serving  # noqa: E402


def _oracle(x, wg, we, be, m, dtype=jnp.bfloat16):
    b, c = x.shape[0], wg.shape[1] // (m + 1)
    g = jnp.dot(x.astype(dtype), wg.astype(dtype),
                preferred_element_type=jnp.float32)
    e = jnp.dot(x.astype(dtype), we.astype(dtype),
                preferred_element_type=jnp.float32) + be
    gating = jax.nn.softmax(g.reshape(b, c, m + 1), axis=-1)
    experts = jax.nn.sigmoid(e.reshape(b, c, m))
    return jnp.sum(gating[..., :m] * experts, axis=-1)


@pytest.mark.parametrize("m", [1, 2, 4])
@pytest.mark.parametrize("b,c", [(16, 64), (37, 83), (8, 300)])
def test_kernel_matches_oracle(m, b, c):
    """Interpret-mode kernel == jnp oracle, incl. non-divisible shapes."""
    rng = np.random.default_rng(m * 1000 + b + c)
    h = 64
    x = jnp.asarray(rng.normal(0, 1, (b, h)), jnp.float32)
    wg = jnp.asarray(rng.normal(0, 0.1, (h, c * (m + 1))), jnp.float32)
    we = jnp.asarray(rng.normal(0, 0.1, (h, c * m)), jnp.float32)
    be = jnp.asarray(rng.normal(0, 0.1, (c * m,)), jnp.float32)
    ref = np.asarray(_oracle(x, wg, we, be, m))
    got = np.asarray(
        moe_head_serving(x, wg, we, be, m, interpret=True,
                         block_b=16, block_c=32)
    )
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_dummy_expert_abstention():
    """A huge dummy-gate logit must drive the prob to ~0 (the (M+1)-th
    gate has no expert — reference abstention semantics)."""
    h, c, m = 8, 4, 2
    x = jnp.ones((2, h), jnp.float32)
    wg = jnp.zeros((h, c * (m + 1)), jnp.float32)
    # class 0: dummy gate logit = h * 10 >> others -> gating mass on dummy
    wg = wg.at[:, m].set(10.0)
    we = jnp.zeros((h, c * m), jnp.float32)
    be = jnp.zeros((c * m,), jnp.float32)
    probs = np.asarray(
        moe_head_serving(x, wg, we, be, m, interpret=True,
                         block_b=8, block_c=4)
    )
    ref = np.asarray(_oracle(x, wg, we, be, m))
    np.testing.assert_allclose(probs, ref, atol=2e-6)
    assert probs[0, 0] < 1e-3  # abstained
    assert abs(probs[0, 1] - 2 / 3 * 0.5) < 1e-3  # 2 of 3 gates x sigmoid(0)


def test_moe_model_fused_dispatch_matches_jnp(monkeypatch):
    """MoeModel serving forward through the fused head (interpret hook)
    == the jnp path."""
    from yt8m_tpu.models import get_model
    from yt8m_tpu.models.hparams import ModelHParams

    rng = np.random.default_rng(5)
    hp = ModelHParams(compute_dtype="float32", vocab_size=50,
                      feature_dim=24, moe_num_mixtures=2,
                      moe_head_pallas=True)
    model = get_model("MoeModel", hp)
    x = jnp.asarray(rng.normal(0, 1, (9, 24)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, None, train=False
    )
    # perturb params away from zero-init biases
    variables = jax.tree_util.tree_map(
        lambda p: p + 0.05 * np.asarray(
            np.random.default_rng(1).normal(size=p.shape), p.dtype
        ),
        variables,
    )
    ref = model.apply(variables, x, None, train=False)["predictions"]
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    got = model.apply(variables, x, None, train=False)["predictions"]
    monkeypatch.delenv("YT8M_PALLAS_INTERPRET")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6
    )
