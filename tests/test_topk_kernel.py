"""exact_topk Pallas kernel (kernels/topk.py) vs jax.lax.top_k.

Kept as a measured experiment: on-chip it ties approx_max_k at k=20
(1.75 vs 1.7-2.2 ms run spread on [2048, 4716]) — see BENCH_NOTES —
so serving keeps approx_max_k; the kernel documents that XLA's top-k
lowering is already near the achievable bound on v5e.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yt8m_tpu.kernels.topk import exact_topk  # noqa: E402


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
