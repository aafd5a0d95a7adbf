"""Fused DBoF cluster+pool inference kernel.

The DBoF serving step's hot section is

    x    = dequant(u8) * in_scale + in_bias      (input BN folded)
    act  = relu((x @ W) * act_scale + act_bias)  (cluster BN folded)
    pool = max_s act                              [B, K]

On the jnp path XLA materialises act [B*S, K] in HBM (f32: ~2 GB at
the reference config B=2048, S=30, K=8192) and reads it back for the
pool — ~4 GB of HBM round-trip per batch. This kernel keeps act in
VMEM: each program computes one (video-block, K-tile) of the pooled
output directly. Grid order (k, b) with b innermost keeps the weight
tile resident across video blocks, so W is read once per K-tile and
the uint8 frames are the only streamed input.

Used by models/frame.py :: _DbofBase on the inference path when
pooling is max (the reference default). Equivalence vs the jnp oracle
is tested in interpret mode; gradients are not needed (inference-only —
training keeps the XLA graph, whose BN needs batch stats anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,        # [BB, S, D] u8 or f32
    inscale_ref,  # [1, D]
    inbias_ref,   # [1, D]
    w_ref,        # [D, KT]
    ascale_ref,   # [1, KT]
    abias_ref,    # [1, KT]
    out_ref,      # [BB, KT]
    *,
    is_u8: bool,
):
    bb, s, d = x_ref.shape
    kt = w_ref.shape[1]
    if is_u8:
        # Mosaic has no direct u8->f32 cast; hop through int32.
        x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    else:
        x = x_ref[...].astype(jnp.float32)
    x = x * inscale_ref[...][None] + inbias_ref[...][None]
    act = jax.lax.dot_general(
        x.reshape(bb * s, d).astype(jnp.bfloat16),
        w_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    act = jnp.maximum(act * ascale_ref[...] + abias_ref[...], 0.0)
    out_ref[...] = jnp.max(act.reshape(bb, s, kt), axis=1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_b", "block_k")
)
def dbof_cluster_maxpool(
    x,          # [B, S, D] uint8 or float32 (sampled frames)
    w,          # [D, K] f32 cluster weights
    in_scale,   # [D] f32 (dequant x input-BN fold, or ones)
    in_bias,    # [D] f32
    act_scale,  # [K] f32 (cluster-BN fold, or ones)
    act_bias,   # [K] f32 (or cluster bias)
    interpret: bool = False,
    block_b: int = 16,
    block_k: int = 1024,
):
    """relu-activated cluster activations max-pooled over S: [B, K] f32."""
    b, s, d = x.shape
    k = w.shape[1]
    bb = min(block_b, b)
    b_pad = ((b + bb - 1) // bb) * bb
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    kt = k if k < block_k else block_k
    if k % kt:
        raise ValueError(f"cluster_size {k} not divisible by tile {kt}")

    out = pl.pallas_call(
        functools.partial(_kernel, is_u8=x.dtype == jnp.uint8),
        grid=(k // kt, b_pad // bb),
        in_specs=[
            pl.BlockSpec(
                (bb, s, d), lambda ki, bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d), lambda ki, bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, d), lambda ki, bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, kt), lambda ki, bi: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda ki, bi: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda ki, bi: (0, ki), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, kt), lambda ki, bi: (bi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * d * k,
            bytes_accessed=(k // kt) * b_pad * s * d
            * (1 if x.dtype == jnp.uint8 else 4)
            + d * k * 4 + b_pad * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        in_scale.reshape(1, d).astype(jnp.float32),
        in_bias.reshape(1, d).astype(jnp.float32),
        w,
        act_scale.reshape(1, k).astype(jnp.float32),
        act_bias.reshape(1, k).astype(jnp.float32),
    )
    return out[:b]


def dbof_cluster_maxpool_reference(
    x, w, in_scale, in_bias, act_scale, act_bias
):
    """jnp oracle with identical math (bf16 matmul, f32 affine)."""
    b, s, d = x.shape
    xf = x.astype(jnp.float32)
    xf = xf * in_scale[None, None, :] + in_bias[None, None, :]
    act = jnp.einsum(
        "bsd,dk->bsk",
        xf.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    act = jnp.maximum(
        act * act_scale[None, None, :] + act_bias[None, None, :], 0.0
    )
    return jnp.max(act, axis=1)
