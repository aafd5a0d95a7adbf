"""Fused MoE-head serving kernel.

The per-class mixture head (reference: video_level_models.py ::
MoeModel.create_model) is

    G = x @ Wg                      [B, C*(M+1)]  (gates, no bias)
    E = x @ We + be                 [B, C*M]
    gating = softmax(G.reshape(B, C, M+1), -1)
    probs  = sum_m gating[..., :M] * sigmoid(E).reshape(B, C, M)

On the jnp path XLA materialises the f32 [B, C, M+1] softmax and
[B, C, M] sigmoid intermediates in HBM (~200 MB/batch at B=2048,
C=4716, M=2) — measured ~5x the FLOP roofline (2.9 ms vs 0.5 ms). This
kernel computes one (video-block, class-tile) of probs entirely in
VMEM.

Two structural tricks avoid strided per-class access inside the kernel:

  * The expert weights/bias are padded OUTSIDE the kernel from stride M
    to the gate's stride M+1, with a -1e9 bias on the dummy column —
    sigmoid(-1e9) == 0 in f32, so the dummy expert contributes exactly
    0, reproducing `gating[..., :M]` with a single aligned elementwise
    product.
  * The per-class sums over the M+1 interleaved columns ride the MXU as
    a matmul with a constant 0/1 selection matrix built from iota
    (S[j, c] = [j // (M+1) == c]), in f32 for exactness.

The softmax is computed ratio-style (exp / sum-exp) with logits clamped
to [-80, 80] instead of per-class max subtraction (the ratio is
shift-invariant; the clamp only matters for |logit| > 80, far outside
trained-model range, and keeps the denominator >= 3e-35 > 0).

Serving-only: gradients are not needed (training keeps the XLA graph).
Equivalence vs the jnp oracle is tested in interpret mode and on-chip
(scripts/validate_kernels_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wg_ref, we_ref, be_ref, out_ref, *, m1, dtype):
    ct = out_ref.shape[1]
    x = x_ref[...].astype(dtype)
    g = jax.lax.dot_general(
        x,
        wg_ref[...].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e = (
        jax.lax.dot_general(
            x,
            we_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + be_ref[...]
    )
    eg = jnp.exp(jnp.clip(g, -80.0, 80.0))
    se = jax.nn.sigmoid(e)
    ji = jax.lax.broadcasted_iota(jnp.int32, (ct * m1, ct), 0) // m1
    ci = jax.lax.broadcasted_iota(jnp.int32, (ct * m1, ct), 1)
    sel = (ji == ci).astype(jnp.float32)
    num = jax.lax.dot_general(
        eg * se, sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    den = jax.lax.dot_general(
        eg, sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = num / den


@functools.partial(
    jax.jit,
    static_argnames=("num_mixtures", "dtype", "interpret", "block_b", "block_c"),
)
def moe_head_serving(
    x,             # [B, H] f32 hidden activations
    gate_kernel,   # [H, C*(M+1)] f32 (class-major interleave, no bias)
    expert_kernel, # [H, C*M] f32
    expert_bias,   # [C*M] f32
    num_mixtures: int,
    dtype=jnp.bfloat16,  # matmul compute dtype (must match the head's)
    interpret: bool = False,
    block_b: int = 256,
    block_c: int = 128,
):
    """probs [B, C] f32 — fused gates+experts+combine per class tile."""
    b, h = x.shape
    m = num_mixtures
    m1 = m + 1
    c = gate_kernel.shape[1] // m1

    # Pre-cast the weights to the matmul dtype OUTSIDE the kernel:
    # halves the per-call HBM weight streaming and the VMEM block
    # footprint under bf16 (the kernel's .astype becomes a no-op).
    wdt = jnp.dtype(dtype)
    gate_kernel = gate_kernel.astype(wdt)
    # Pad experts from stride M to stride M+1 (dummy column: zero
    # weights, -1e9 bias -> sigmoid == 0 == the dummy expert's
    # contribution). Row-major reshapes are layout-free; the pad is the
    # only data movement (~20 MB bf16, ~0.05 ms — well under the ~2 ms
    # the fusion saves).
    we = jnp.pad(
        expert_kernel.astype(wdt).reshape(h, c, m),
        ((0, 0), (0, 0), (0, 1)),
    ).reshape(h, c * m1)
    be = jnp.pad(
        expert_bias.reshape(c, m), ((0, 0), (0, 1)),
        constant_values=-1e9,
    ).reshape(1, c * m1)

    bb = min(block_b, b)
    ct = min(block_c, c)
    b_pad = ((b + bb - 1) // bb) * bb
    c_pad = ((c + ct - 1) // ct) * ct
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    if c_pad != c:
        # Padded classes: zero gate/expert weights -> eg = 1, den = m1;
        # finite, sliced off below.
        gk = jnp.pad(gate_kernel, ((0, 0), (0, (c_pad - c) * m1)))
        we = jnp.pad(we, ((0, 0), (0, (c_pad - c) * m1)))
        be = jnp.pad(be, ((0, 0), (0, (c_pad - c) * m1)))
    else:
        gk = gate_kernel

    grid = (c_pad // ct, b_pad // bb)  # b inner: weight tiles stay put
    out = pl.pallas_call(
        functools.partial(_kernel, m1=m1, dtype=jnp.dtype(dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bb, h), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (h, ct * m1), lambda j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (h, ct * m1), lambda j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ct * m1), lambda j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * h * c_pad * m1 * 2
            + 2 * b_pad * c_pad * m1 * c_pad // (c_pad // ct),
            bytes_accessed=(c_pad // ct) * b_pad * h * 4
            + h * c_pad * m1 * 2 * jnp.dtype(dtype).itemsize
            + b_pad * c_pad * 4,
            transcendentals=2 * b_pad * c_pad * m1,
        ),
        interpret=interpret,
    )(x, gk, we, be)
    return out[:b, :c]
