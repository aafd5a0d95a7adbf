"""Exact top-k Pallas kernel for the serving tail.

jax.lax.approx_max_k(recall_target=1.0) on [2048, 4716] f32 measures
1.7-1.8 ms on v5e — ~17x its HBM read roofline (the lowering is
compute-bound, and shape-sensitive: 3.7 ms at width 4864). This kernel
loads a row block into VMEM once and runs k unrolled select-max sweeps
(max over lanes -> lowest-index argmax via an iota min -> mask), so HBM
traffic is one read of x + [B, k] outputs.

Tie-breaking matches jax.lax.top_k: equal values resolve to the lowest
class index. Values are emitted in descending order.

Status: ON the serving path (serving_topk below) since r3. In
isolation it ties approx_max_k(recall=1.0) (1.75 ms vs 1.7-2.2 ms at
k=20 on [2048, 4716] — XLA's lowering is near the v5e bound), BUT an
approx_max_k that consumes a Pallas-produced buffer pays a ~1 ms
boundary penalty while this kernel does not: the full DBoF serving
step measures 11.08 ms with Pallas-head + exact_topk vs 13.08 ms with
XLA-head + approx_max_k (+18%, scripts/exp_pallas_tail_chain.py,
BENCH_NOTES "Pallas tail chain"). k <= 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # below any f32 input we serve (probabilities/logits)
# Public alias: exact_topk reports exactly this value for sanitised
# NaN / <=-3e38 inputs; consumers (infer/predict.py tripwire) compare
# against it rather than re-hardcoding the literal.
TOPK_NEG = _NEG


def _kernel(x_ref, vals_ref, idx_ref, *, k, kpad):
    bb, cpad = x_ref.shape
    v = x_ref[...]
    # Sanitise: NaN and anything at/below the _NEG padding sentinel
    # rank LAST (reported as _NEG) with valid in-range indices. Without
    # this a single NaN poisons its row's max (`hit` goes all-False and
    # the 2**30 argmin sentinel leaks into idx), and a -inf input would
    # lose to the out-of-range padding columns. Knocked-out lanes go to
    # -inf below, so sanitised real lanes always beat them; ties with
    # the _NEG padding resolve to the real lane (lower index). Finite
    # inputs above _NEG — every model output we serve — are untouched.
    v = jnp.maximum(
        jnp.where(jnp.isnan(v), jnp.float32(_NEG), v),
        jnp.float32(_NEG),
    )
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
        v = jnp.where(lanes == am, jnp.float32(-jnp.inf), v)
    vals_ref[...] = vals
    idx_ref[...] = idxs


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "block_b")
)
def exact_topk(
    x,                  # [B, C] f32
    k: int = 20,
    interpret: bool = False,
    block_b: int | None = None,
):
    """(values [B, k] f32 desc-sorted, indices [B, k] i32), exact.

    Contract: for finite inputs above -3.0e38 (any probability/logit a
    model serves) the output is bitwise lax.top_k, lowest-index ties.
    NaN and values <= -3.0e38 are sanitised to rank LAST and report
    value -3.0e38 (lax.top_k would instead rank NaN first) — indices
    stay valid and in-range either way, so a diverged model degrades
    to garbage-but-bounded metrics rather than out-of-range gathers.

    block_b=None picks 256 for k <= 32 and 128 above: the k unrolled
    sweeps each keep [bb, c_pad] temporaries live, and k=64 at bb=256
    measures 20.6 MB scoped VMEM — past the 16 MB cap (bb=128 fits and
    is bitwise-equal to lax.top_k on-chip at [2048, 4716])."""
    b, c = x.shape
    if k > 128:
        raise ValueError(f"exact_topk supports k <= 128, got {k}")
    if block_b is None:
        block_b = 256 if k <= 32 else 128
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


def _dispatch_topk(x, k: int, interpret: bool, fallback):
    """Shared Pallas-vs-XLA dispatch for the two top-k entry points.

    The kernel takes the call when it is measured-faster — kernels
    enabled, k within the kernel bound, TPU backend (or forced
    interpret) — AND the shape is fully static: under jax.export's
    polymorphic batch the dims are symbolic and the kernel's block/pad
    arithmetic cannot trace, so export falls back to the XLA op
    (kernels.static_shape)."""
    from yt8m_tpu.kernels import (
        kernels_enabled,
        pallas_interpret_forced,
        static_shape,
    )

    interpret = interpret or pallas_interpret_forced()
    if (
        kernels_enabled()
        and k <= 128
        and (jax.default_backend() == "tpu" or interpret)
        and static_shape(x)
    ):
        return exact_topk(x.astype(jnp.float32), k, interpret=interpret)
    v, i = fallback(x.astype(jnp.float32), k)
    return v, i.astype(jnp.int32)


def serving_topk(x, k: int, interpret: bool = False):
    """Serving-tail top-k: (values [B,k] f32 desc, indices [B,k] i32).

    Dispatches to the Pallas exact_topk when it is measured-faster
    (_dispatch_topk) and otherwise to
    jax.lax.approx_max_k(recall_target=1.0), which is also exact. Both
    branches sort descending; exact_topk additionally matches
    lax.top_k's lowest-index tie-break. The Pallas branch is what lets
    the fused MoE head kernel pay no Pallas->XLA boundary penalty at
    the top-k consumer (see module docstring)."""
    return _dispatch_topk(
        x,
        k,
        interpret,
        lambda xx, kk: jax.lax.approx_max_k(xx, kk, recall_target=1.0),
    )


def sorted_topk(x, k: int, interpret: bool = False):
    """lax.top_k-semantics top-k for the EVAL metric path.

    Same Pallas dispatch as serving_topk, but the fallback is
    jax.lax.top_k (not approx_max_k) so the CPU/off path keeps
    lax.top_k's tie ordering bit-for-bit — the on-device metric
    sparsification's bitwise-equality contract (test_metrics.py) must
    hold in BOTH dispatch states. On TPU the kernel is bitwise-equal to
    lax.top_k (values and indices, verified at [2048, 4716] k=64) for
    finite inputs above -3.0e38; NaN inputs rank last instead of first
    (see exact_topk's contract) — never out-of-range indices. Skips the
    Mosaic->XLA boundary penalty after the Pallas MoE head."""
    return _dispatch_topk(x, k, interpret, jax.lax.top_k)
