"""Exact top-k Pallas kernel for the serving tail.

jax.lax.approx_max_k(recall_target=1.0) on [2048, 4716] f32 measures
1.7-1.8 ms on v5e — ~17x its HBM read roofline (the lowering is
compute-bound, and shape-sensitive: 3.7 ms at width 4864). This kernel
loads a row block into VMEM once and runs k unrolled select-max sweeps
(max over lanes -> lowest-index argmax via an iota min -> mask), so HBM
traffic is one read of x + [B, k] outputs.

Tie-breaking matches jax.lax.top_k: equal values resolve to the lowest
class index. Values are emitted in descending order.

Status: measured EXPERIMENT, not on the serving path. On-chip it ties
approx_max_k(recall=1.0) (1.75 ms vs 1.7-2.2 ms at k=20 on
[2048, 4716] — XLA's lowering is already near the v5e bound), so
make_topk_predict_step keeps approx_max_k; this kernel stays as the
tested record of that experiment (tests/test_topk_kernel.py,
BENCH_NOTES "Exact top-k kernel experiment"). k <= 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # below any f32 input we serve (probabilities/logits)


def _kernel(x_ref, vals_ref, idx_ref, *, k, kpad):
    bb, cpad = x_ref.shape
    v = x_ref[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bb, cpad), 1)
    vals = jnp.full((bb, kpad), 0.0, jnp.float32)
    idxs = jnp.zeros((bb, kpad), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bb, kpad), 1)
    for j in range(k):
        m = jnp.max(v, axis=1, keepdims=True)                 # [bb, 1]
        hit = v == m
        am = jnp.min(
            jnp.where(hit, lanes, jnp.int32(2**30)), axis=1,
            keepdims=True,
        )                                                      # [bb, 1]
        vals = jnp.where(cols == j, m, vals)
        idxs = jnp.where(cols == j, am, idxs)
        v = jnp.where(lanes == am, jnp.float32(_NEG), v)
    vals_ref[...] = vals
    idx_ref[...] = idxs


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "block_b")
)
def exact_topk(
    x,                  # [B, C] f32
    k: int = 20,
    interpret: bool = False,
    block_b: int = 256,
):
    """(values [B, k] f32 desc-sorted, indices [B, k] i32), exact."""
    b, c = x.shape
    if k > 128:
        raise ValueError(f"exact_topk supports k <= 128, got {k}")
    kpad = 128
    bb = min(block_b, b)
    b_pad = ((b + bb - 1) // bb) * bb
    c_pad = ((c + 127) // 128) * 128
    if b_pad != b or c_pad != c:
        x = jnp.pad(
            x, ((0, b_pad - b), (0, c_pad - c)), constant_values=_NEG
        )

    vals, idxs = pl.pallas_call(
        functools.partial(_kernel, k=k, kpad=kpad),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bb, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bb, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * k * b_pad * c_pad,
            bytes_accessed=b_pad * c_pad * 4 + b_pad * kpad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return vals[:b, :k], idxs[:b, :k]
