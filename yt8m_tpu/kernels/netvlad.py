"""Fused NetVLAD aggregation Pallas kernel.

One program per video fuses the whole aggregation (BASELINE.json
north_star: NetVLAD soft-assignment as a fused Pallas kernel):

    x      = u8 * deq_scale + deq_bias          (on-the-fly dequantize)
    act    = x @ Wc * act_scale + act_bias      (inference BN folded)
    assign = softmax_K(act) * (t < num_frames)  (masked soft-assignment)
    vlad   = assign^T @ x - colsum(assign)[:,None] * centers
    vlad   = intra_norm_D(vlad);  vlad /= ||vlad||_2       (both norms fused)

Everything stays in VMEM: the [F, K] assignment matrix — which the jnp
path materialises in HBM twice (softmax out, einsum in) — never leaves
the chip. Per video that's ~0.6 MB of HBM traffic saved, and the two
MXU matmuls ([F,D]x[D,K] and [K,F]x[F,D]) run back-to-back.

Used on the inference/eval path (training BN needs cross-batch stats, so
training keeps the jnp graph). Equivalence vs the jnp oracle is tested in
interpret mode (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    nf_ref,          # scalar prefetch: [B] int32 num_frames
    frames_ref,      # [1, F, D] (u8 or f32)
    wc_ref,          # [D, K]
    act_scale_ref,   # [1, K]
    act_bias_ref,    # [1, K]
    centers_ref,     # [K, D]
    out_ref,         # [1, K, D]
    *,
    deq_scale: float,
    deq_bias: float,
    is_u8: bool,
    dtype,
):
    b = pl.program_id(0)
    f = frames_ref.shape[1]
    if is_u8:
        # Mosaic has no direct u8->f32 cast; hop through int32.
        x = frames_ref[0].astype(jnp.int32).astype(jnp.float32)
        x = x * deq_scale + deq_bias
    else:
        x = frames_ref[0].astype(jnp.float32)

    act = jnp.dot(
        x.astype(dtype),
        wc_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    act = act * act_scale_ref[...] + act_bias_ref[...]

    # masked softmax over clusters (rows beyond num_frames zeroed)
    act = act - jnp.max(act, axis=-1, keepdims=True)
    e = jnp.exp(act)
    assign = e / jnp.sum(e, axis=-1, keepdims=True)
    nf = nf_ref[b]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, assign.shape, 0)
    assign = jnp.where(row_ids < nf, assign, 0.0)

    a_sum = jnp.sum(assign, axis=0, keepdims=True)  # [1, K]
    vlad = jax.lax.dot_general(
        assign.astype(dtype),
        x.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # [K, D]
        preferred_element_type=jnp.float32,
    )
    vlad = vlad - a_sum.T * centers_ref[...]

    # intra-normalisation over D, then global L2 over [K, D]
    inorm = jnp.sqrt(jnp.sum(vlad * vlad, axis=1, keepdims=True))
    vlad = vlad / jnp.maximum(inorm, 1e-6)
    gnorm = jnp.sqrt(jnp.sum(vlad * vlad))
    out_ref[0] = vlad / jnp.maximum(gnorm, 1e-6)


@functools.partial(jax.jit, static_argnames=("interpret", "dtype"))
def netvlad_aggregate(
    frames,      # [B, F, D] uint8 or float32
    num_frames,  # [B] int32
    cluster_w,   # [D, K] f32
    act_scale,   # [K] f32 (inference BN scale, or ones)
    act_bias,    # [K] f32 (inference BN bias + cluster bias)
    centers,     # [K, D] f32 (cluster_weights2 transposed)
    deq_scale: float = 4.0 / 255.0,
    deq_bias: float = 4.0 / 512.0 - 2.0,
    interpret: bool = False,
    dtype=jnp.bfloat16,  # matmul compute dtype (pass the model's hp.dtype)
):
    """Fully normalised VLAD descriptors [B, K, D] float32."""
    b, f, d = frames.shape
    k = cluster_w.shape[1]
    f_pad = _round_up(f, 8)
    if f_pad != f:
        frames = jnp.pad(frames, ((0, 0), (0, f_pad - f), (0, 0)))
    is_u8 = frames.dtype == jnp.uint8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, k), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, d), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k, d), lambda i, nf: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel,
            deq_scale=float(deq_scale),
            deq_bias=float(deq_bias),
            is_u8=is_u8,
            dtype=jnp.dtype(dtype),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * f_pad * d * k,
            bytes_accessed=b * f_pad * d * (1 if is_u8 else 4)
            + d * k * 8 + b * k * d * 4,
            transcendentals=b * f_pad * k,
        ),
        interpret=interpret,
    )(num_frames.astype(jnp.int32), frames, cluster_w,
      act_scale.reshape(1, k), act_bias.reshape(1, k), centers)


def netvlad_aggregate_reference(
    frames, num_frames, cluster_w, act_scale, act_bias, centers,
    deq_scale: float = 4.0 / 255.0,
    deq_bias: float = 4.0 / 512.0 - 2.0,
):
    """jnp oracle with identical math (bf16 matmuls, f32 softmax)."""
    b, f, d = frames.shape
    k = cluster_w.shape[1]
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x * deq_scale + deq_bias
    act = jnp.einsum(
        "bfd,dk->bfk",
        x.astype(jnp.bfloat16),
        cluster_w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    act = act * act_scale[None, None, :] + act_bias[None, None, :]
    assign = jax.nn.softmax(act, axis=-1)
    mask = (
        jnp.arange(f)[None, :] < num_frames.astype(jnp.int32)[:, None]
    )
    assign = jnp.where(mask[:, :, None], assign, 0.0)
    a_sum = jnp.sum(assign, axis=1)  # [B, K]
    vlad = jnp.einsum(
        "bfk,bfd->bkd",
        assign.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    vlad = vlad - a_sum[:, :, None] * centers[None, :, :]
    inorm = jnp.linalg.norm(vlad, axis=2, keepdims=True)
    vlad = vlad / jnp.maximum(inorm, 1e-6)
    gnorm = jnp.linalg.norm(
        vlad.reshape(b, -1), axis=1, keepdims=True
    )[..., None]
    return vlad / jnp.maximum(gnorm, 1e-6)
