"""Fused masked attention-pooling Pallas kernel.

north_star: "multi-head attention pooling ... as fused Pallas kernels".
Per video, in one VMEM-resident pass:

    x      = u8 * deq_scale + deq_bias      (on-the-fly dequantize)
    scores = x @ Q                          [F, H]
    attn   = softmax_F(scores masked to t < num_frames)
    pooled = attn^T @ x                     [H, D]

The [F, H] score matrix and the dequantized frames never touch HBM.
Training uses the jnp graph (autodiff); equivalence is tested in
interpret mode.
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
    nf_ref, frames_ref, q_ref, out_ref, *,
    deq_scale: float, deq_bias: float, is_u8: bool, dtype,
):
    b = pl.program_id(0)
    if is_u8:
        x = frames_ref[0].astype(jnp.int32).astype(jnp.float32)
        x = x * deq_scale + deq_bias
    else:
        x = frames_ref[0].astype(jnp.float32)

    scores = jnp.dot(
        x.astype(dtype),
        q_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    )  # [F, H]
    nf = nf_ref[b]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    scores = jnp.where(row_ids < nf, scores, -1e9)
    scores = scores - jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores)
    attn = e / jnp.sum(e, axis=0, keepdims=True)  # softmax over time

    pooled = jax.lax.dot_general(
        attn.astype(dtype),
        x.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # [H, D]
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = pooled


@functools.partial(jax.jit, static_argnames=("interpret", "dtype"))
def attention_pool(
    frames,      # [B, F, D] uint8 or float32
    num_frames,  # [B] int32
    query,       # [D, H] float32
    deq_scale: float = 4.0 / 255.0,
    deq_bias: float = 4.0 / 512.0 - 2.0,
    interpret: bool = False,
    dtype=jnp.bfloat16,  # matmul compute dtype (pass the model's hp.dtype)
):
    """Per-head masked attention pooling -> [B, H, D] float32."""
    b, f, d = frames.shape
    h = query.shape[1]
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
                (d, h), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, d), lambda i, nf: (i, 0, 0), memory_space=pltpu.VMEM
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
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * f_pad * d * h,
            bytes_accessed=b * f_pad * d * (1 if is_u8 else 4)
            + d * h * 4 + b * h * d * 4,
            transcendentals=b * f_pad * h,
        ),
        interpret=interpret,
    )(num_frames.astype(jnp.int32), frames, query)


def attention_pool_reference(
    frames, num_frames, query,
    deq_scale: float = 4.0 / 255.0,
    deq_bias: float = 4.0 / 512.0 - 2.0,
):
    """jnp oracle with identical math."""
    b, f, d = frames.shape
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x * deq_scale + deq_bias
    scores = jnp.einsum(
        "bfd,dh->bfh",
        x.astype(jnp.bfloat16),
        query.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    mask = jnp.arange(f)[None, :] < num_frames.astype(jnp.int32)[:, None]
    scores = jnp.where(mask[:, :, None], scores, -1e9)
    attn = jax.nn.softmax(scores, axis=1)
    return jnp.einsum(
        "bfh,bfd->bhd",
        attn.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
