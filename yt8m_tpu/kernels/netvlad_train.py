"""Trainable fused NetVLAD core: custom-VJP Pallas kernels.

The VJP boundary wraps the hot block of the aggregation —

    assign = softmax_K(act) * (t < num_frames)      [F, K]  (per video)
    a_sum  = sum_f assign                            [K]
    vlad   = assign^T @ x - a_sum[:, None] * centers [K, D]

— leaving dequantize, the assignment matmul + BatchNorm (cross-batch
stats) and the two normalisations to XLA, where autodiff and fusion
already handle them well.

Flash-attention-style rematerialisation: the forward saves NO
assignment matrix — the backward kernel recomputes softmax(act) from
the (already-in-HBM) activations. Per video the [F, K] assignment and
its cotangent never touch HBM, and the softmax+mask+2 matmuls fuse
into one VMEM-resident pass each way.

Backward math (per video, live rows only — masked rows have assign=0
so their gradients vanish):

    dassign = x @ dvlad^T - 1_F (sum_d centers * dvlad)   [F, K]
    dact    = assign * (dassign - sum_k assign * dassign) (softmax VJP)
    dx      = assign @ dvlad                               [F, D]
    dcenters = -sum_b a_sum[b] outer dvlad[b]   (plain XLA reduction)

Used by models/netvlad.py on the TRAINING path (the inference path uses
the fully fused kernels/netvlad.py which also folds dequantize + BN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softmax_masked(act, nf):
    act = act - jnp.max(act, axis=-1, keepdims=True)
    e = jnp.exp(act)
    assign = e / jnp.sum(e, axis=-1, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, assign.shape, 0)
    return jnp.where(rows < nf, assign, 0.0)


def _fwd_kernel(nf_ref, act_ref, x_ref, centers_ref, vlad_ref, asum_ref):
    b = pl.program_id(0)
    assign = _softmax_masked(act_ref[0].astype(jnp.float32), nf_ref[b])
    vlad = jax.lax.dot_general(
        assign.astype(jnp.bfloat16),
        x_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),  # [K, D]
        preferred_element_type=jnp.float32,
    )
    a_sum = jnp.sum(assign, axis=0, keepdims=True)  # [1, K]
    vlad_ref[0] = vlad - a_sum.T * centers_ref[...]
    # a_sum output is [B, 1, K]: Mosaic requires the last two block dims
    # to be 8/128-divisible or equal to the array dims, so a (1, K) block
    # over a (B, K) array is not lowerable; (1, 1, K) over (B, 1, K) is.
    asum_ref[0] = a_sum


def _bwd_kernel(
    nf_ref, act_ref, x_ref, centers_ref, dvlad_ref, dact_ref, dx_ref
):
    b = pl.program_id(0)
    assign = _softmax_masked(act_ref[0].astype(jnp.float32), nf_ref[b])
    dvlad = dvlad_ref[0].astype(jnp.float32)

    # dassign = x @ dvlad^T - sum_d(centers * dvlad) broadcast over F
    dassign = jax.lax.dot_general(
        x_ref[0].astype(jnp.bfloat16),
        dvlad.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),  # [F, K]
        preferred_element_type=jnp.float32,
    )
    cdot = jnp.sum(
        centers_ref[...] * dvlad, axis=1, keepdims=True
    )  # [K, 1]
    dassign = dassign - cdot.T

    # softmax VJP (masked rows: assign = 0 -> dact = 0)
    s = jnp.sum(assign * dassign, axis=-1, keepdims=True)
    dact_ref[0] = assign * (dassign - s)
    dx_ref[0] = jnp.dot(
        assign.astype(jnp.bfloat16),
        dvlad.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _run_fwd(act, x, num_frames, centers, interpret):
    # No F padding: Mosaic allows block dims EQUAL to the array dims, so
    # a (1, F, K) block over (B, F, K) lowers for any F — padding here
    # would force full HBM copies of x and act (~1.3 GB/step at the
    # reference config), which measurably slowed the train step.
    b, f, k = act.shape
    d = x.shape[2]
    f_pad = f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad, k), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f_pad, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, d), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, k, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, k), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, k, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * f_pad * d * k,
            bytes_accessed=b * f_pad * (d + k) * 4 + b * k * d * 4,
            transcendentals=b * f_pad * k,
        ),
        interpret=interpret,
    )(num_frames.astype(jnp.int32), act, x, centers)


def _run_bwd(act, x, num_frames, centers, dvlad, interpret):
    b, f, k = act.shape
    d = x.shape[2]
    f_pad = f
    act_p = act
    x_p = x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad, k), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f_pad, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, d), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, f_pad, k), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f_pad, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    dact, dx = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, f_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b, f_pad, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * f_pad * d * k,
            bytes_accessed=b * f_pad * (2 * d + 2 * k) * 4
            + 2 * b * k * d * 4,
            transcendentals=b * f_pad * k,
        ),
        interpret=interpret,
    )(num_frames.astype(jnp.int32), act_p, x_p, centers, dvlad)
    return dact, dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def netvlad_core(act, x, num_frames, centers, interpret: bool = False):
    """Differentiable fused VLAD core.

    act [B, F, K] post-BN assignment logits, x [B, F, D] float frames,
    num_frames [B] int32, centers [K, D] -> vlad [B, K, D] (un-normalised).
    """
    vlad, _ = _run_fwd(act, x, num_frames, centers, interpret)
    return vlad


def _fwd_rule(act, x, num_frames, centers, interpret):
    vlad, a_sum = _run_fwd(act, x, num_frames, centers, interpret)
    return vlad, (act, x, num_frames, centers, a_sum[:, 0])


def _bwd_rule(interpret, residuals, dvlad):
    act, x, num_frames, centers, a_sum = residuals
    dact, dx = _run_bwd(act, x, num_frames, centers, dvlad, interpret)
    # centers enter only via  vlad -= a_sum[:, None] * centers
    dcenters = -jnp.einsum(
        "bk,bkd->kd", a_sum, dvlad, preferred_element_type=jnp.float32
    )
    return dact, dx, None, dcenters


def _softmax_masked_batch(act, num_frames):
    assign = jax.nn.softmax(act, axis=-1)
    f = act.shape[1]
    mask = jnp.arange(f)[None, :] < num_frames.astype(jnp.int32)[:, None]
    return jnp.where(mask[:, :, None], assign, 0.0)


netvlad_core.defvjp(_fwd_rule, _bwd_rule)


def netvlad_core_reference(act, x, num_frames, centers):
    """jnp oracle with identical math (bf16 matmuls, f32 softmax)."""
    assign = _softmax_masked_batch(act.astype(jnp.float32), num_frames)
    vlad = jnp.einsum(
        "bfk,bfd->bkd",
        assign.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    a_sum = jnp.sum(assign, axis=1)
    vlad = vlad - a_sum[:, :, None] * centers[None, :, :]
    return vlad, a_sum
