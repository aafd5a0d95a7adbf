"""exact_topk Pallas kernel (kernels/topk.py) vs jax.lax.top_k.

On the serving path since r3 via serving_topk: paired with the fused
MoE head it avoids the ~1 ms approx_max_k-after-Pallas boundary
penalty (full DBoF serving step 11.08 vs 13.08 ms — BENCH_NOTES
"Pallas tail chain").
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yt8m_tpu.kernels.topk import exact_topk, serving_topk  # noqa: E402


@pytest.mark.parametrize("b,c,k", [(37, 301, 20), (8, 100, 5), (16, 128, 1)])
def test_matches_lax_topk(b, c, k):
    rng = np.random.default_rng(b + c + k)
    x = jnp.asarray(rng.random((b, c)), jnp.float32)
    v, i = exact_topk(x, k, interpret=True, block_b=16)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_tie_break_lowest_index():
    """Equal values resolve to the lowest class index (lax.top_k rule)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.repeat(rng.random((8, 40)), 3, axis=1), jnp.float32)
    v, i = exact_topk(x, 10, interpret=True, block_b=8)
    rv, ri = jax.lax.top_k(x, 10)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_k_bound():
    x = jnp.zeros((4, 300), jnp.float32)
    with pytest.raises(ValueError):
        exact_topk(x, 129, interpret=True)


def test_serving_topk_dispatch_parity(monkeypatch):
    """serving_topk's two branches (Pallas kernel on TPU/interpret,
    approx_max_k elsewhere) return identical (values, indices) — the
    dispatch is a pure performance choice, never a semantics one."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((33, 4716)), jnp.float32)

    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "1")
    pv, pi = serving_topk(x, 20)
    monkeypatch.setenv("YT8M_PALLAS_INTERPRET", "0")
    monkeypatch.setenv("YT8M_DISABLE_PALLAS", "1")
    av, ai = serving_topk(x, 20)

    assert pi.dtype == jnp.int32 and ai.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ai))
    rv, ri = jax.lax.top_k(x, 20)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_serving_topk_large_k_falls_back():
    """k > 128 exceeds the kernel bound; serving_topk must route to
    approx_max_k instead of raising."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((4, 400)), jnp.float32)
    v, i = serving_topk(x, 200, interpret=True)
    rv, ri = jax.lax.top_k(x, 200)
    assert i.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_nan_and_neginf_rank_last_with_valid_indices():
    """exact_topk's sanitisation contract: NaN / -inf / <=-3e38 inputs
    rank LAST (value reported as -3e38) with valid in-range indices —
    a single NaN used to poison its row's max so every slot emitted the
    2**30 argmin sentinel, which downstream take_along_axis silently
    clamped to the last class."""
    x = np.array(
        [
            [0.9, np.nan, 0.5, 0.1, 0.3],
            [np.nan, np.nan, np.nan, np.nan, np.nan],
            [-np.inf, 0.2, -3.2e38, 0.7, 0.4],
            [0.8, 0.6, 0.4, 0.2, 0.0],  # clean row: bitwise lax.top_k
        ],
        np.float32,
    )
    v, i = exact_topk(jnp.asarray(x), 3, interpret=True, block_b=4)
    v, i = np.asarray(v), np.asarray(i)
    assert i.min() >= 0 and i.max() < 5
    # Row 0: NaN ranks last -> top-3 are the finite 0.9, 0.5, 0.3.
    np.testing.assert_array_equal(i[0], [0, 2, 4])
    np.testing.assert_allclose(v[0], [0.9, 0.5, 0.3])
    # Row 1 (all NaN): deterministic lowest-index fill, sentinel value.
    np.testing.assert_array_equal(i[1], [0, 1, 2])
    assert np.all(v[1] == np.float32(-3.0e38))
    # Row 2: -inf and -3.2e38 rank behind every finite-normal entry.
    np.testing.assert_array_equal(i[2], [3, 4, 1])
    # Clean row stays bitwise lax.top_k.
    rv, ri = jax.lax.top_k(jnp.asarray(x[3:4]), 3)
    np.testing.assert_array_equal(v[3:4], np.asarray(rv))
    np.testing.assert_array_equal(i[3:4], np.asarray(ri))
