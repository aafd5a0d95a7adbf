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


def _kernel_v2(
    x_ref,        # [BB, S, D] u8 (sampled frames)
    inscale_ref,  # [1, D]
    inbias_ref,   # [1, D]
    w_ref,        # [D, KT] bf16
    ascale_ref,   # [1, KT]
    abias_ref,    # [1, KT]
    out_ref,      # [BB, KT]
    xa_ref,       # scratch [BB*S, D] dtype — dequant+affined, matmul-ready
    *,
    is_u8: bool,
    dtype,
):
    bb, s, d = x_ref.shape
    kt = w_ref.shape[1]
    ki = pl.program_id(1)

    # Grid order (b, k): the x block and its cast live across the K
    # sweep, so dequant + input affine run ONCE per video block instead
    # of once per K-tile (the v1 kernel re-casts the u8 block K/KT
    # times — ~1.5 ms of repeated VPU work at the serving config).
    @pl.when(ki == 0)
    def _():
        if is_u8:
            x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
        else:
            x = x_ref[...].astype(jnp.float32)
        x = x * inscale_ref[...][None] + inbias_ref[...][None]
        xa_ref[...] = x.reshape(bb * s, d).astype(dtype)

    act = jax.lax.dot_general(
        xa_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    act = jnp.maximum(act * ascale_ref[...] + abias_ref[...], 0.0)
    out_ref[...] = jnp.max(act.reshape(bb, s, kt), axis=1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_b", "block_k", "dtype")
)
def dbof_cluster_maxpool_v2(
    x,          # [B, S, D] uint8 or float32 (sampled frames)
    w,          # [D, K] f32 cluster weights
    in_scale,   # [D] f32
    in_bias,    # [D] f32
    act_scale,  # [K] f32
    act_bias,   # [K] f32
    interpret: bool = False,
    block_b: int = 32,
    block_k: int = 512,
    dtype=jnp.bfloat16,  # matmul compute dtype (pass the model's hp.dtype)
):
    """Grid-(b,k) variant of dbof_cluster_maxpool: cast-once scratch,
    compute-dtype weight tiles streamed (hidden under the MXU sweep for
    block_b >= 16)."""
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
        functools.partial(
            _kernel_v2, is_u8=x.dtype == jnp.uint8,
            dtype=jnp.dtype(dtype),
        ),
        grid=(b_pad // bb, k // kt),
        in_specs=[
            pl.BlockSpec(
                (bb, s, d), lambda bi, ki: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d), lambda bi, ki: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, d), lambda bi, ki: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, kt), lambda bi, ki: (bi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb * s, d), jnp.dtype(dtype)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * d * k,
            bytes_accessed=b_pad * s * d
            * (1 if x.dtype == jnp.uint8 else 4)
            + (b_pad // bb) * d * k * jnp.dtype(dtype).itemsize
            + b_pad * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        in_scale.reshape(1, d).astype(jnp.float32),
        in_bias.reshape(1, d).astype(jnp.float32),
        w.astype(jnp.dtype(dtype)),
        act_scale.reshape(1, k).astype(jnp.float32),
        act_bias.reshape(1, k).astype(jnp.float32),
    )
    return out[:b]


def _kernel_int8(
    x_ref,        # [BB, S, D] int8 (raw u8 bytes XOR 0x80, i.e. u8-128)
    w8_ref,       # [D, KT] int8 (per-column symmetric quant of s_in*W)
    a_ref,        # [1, KT] f32 — per-column scale (gamma * act_scale)
    b_ref,        # [1, KT] f32 — folded bias (see wrapper)
    out_ref,      # [BB, KT]
    xi_ref,       # scratch [BB*S, D] int8
):
    bb, s, d = x_ref.shape
    kt = w8_ref.shape[1]
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        xi_ref[...] = x_ref[...].reshape(bb * s, d)

    acc = jax.lax.dot_general(
        xi_ref[...],
        w8_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    act = jnp.maximum(
        acc.astype(jnp.float32) * a_ref[...] + b_ref[...], 0.0
    )
    out_ref[...] = jnp.max(act.reshape(bb, s, kt), axis=1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_b", "block_k")
)
def dbof_cluster_maxpool_int8(
    x,          # [B, S, D] uint8 (sampled frames, raw bytes)
    w,          # [D, K] f32 cluster weights
    in_scale,   # [D] f32 (dequant x input-BN fold)
    in_bias,    # [D] f32
    act_scale,  # [K] f32
    act_bias,   # [K] f32
    interpret: bool = False,
    block_b: int = 64,
    block_k: int = 512,
):
    """Opt-in int8 MXU serving path (--dbof_int8_serving).

    The input-side math is EXACT: features are raw uint8 integers, so
    dequantize + input-BN affine fold into the weights —
        (x*s_in + b_in) @ W = x @ (s_in.W) + b_in @ W.
    x rides the MXU as (x-128) int8 (byte XOR 0x80), corrected by a
    precomputed 128*colsum term. The ONLY approximation is per-column
    symmetric int8 quantization of W' = s_in.W (max |W'_dk| -> 127),
    i.e. <=0.4% of the column max per weight — measured ~1.6x the bf16
    v2 kernel on the serving hot section. Default OFF: the bf16 path is
    the reference-numerics serving contract (BENCH_NOTES r2).
    """
    if x.dtype != jnp.uint8:
        raise ValueError("int8 serving path requires uint8 features")
    b, s, d = x.shape
    k = w.shape[1]

    w_prime = in_scale[:, None].astype(jnp.float32) * w  # [D, K]
    gamma = jnp.maximum(jnp.max(jnp.abs(w_prime), axis=0), 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w_prime / gamma[None, :]), -127, 127).astype(
        jnp.int8
    )
    colsum = jnp.sum(w8.astype(jnp.float32), axis=0)  # [K]
    c = in_bias.astype(jnp.float32) @ w  # [K]
    a_col = gamma * act_scale  # acc scale
    b_col = (128.0 * colsum * gamma + c) * act_scale + act_bias

    xi = jax.lax.bitcast_convert_type(
        jnp.bitwise_xor(x, jnp.uint8(0x80)), jnp.int8
    )

    bb = min(block_b, b)
    b_pad = ((b + bb - 1) // bb) * bb
    if b_pad != b:
        xi = jnp.pad(xi, ((0, b_pad - b), (0, 0), (0, 0)))
    kt = k if k < block_k else block_k
    if k % kt:
        raise ValueError(f"cluster_size {k} not divisible by tile {kt}")

    out = pl.pallas_call(
        _kernel_int8,
        grid=(b_pad // bb, k // kt),
        in_specs=[
            pl.BlockSpec(
                (bb, s, d), lambda bi, ki: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, kt), lambda bi, ki: (bi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb * s, d), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * d * k,
            bytes_accessed=b_pad * s * d
            + (b_pad // bb) * d * k + b_pad * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xi,
        w8,
        a_col.reshape(1, k).astype(jnp.float32),
        b_col.reshape(1, k).astype(jnp.float32),
    )
    return out[:b]


_S_PAD = 32  # scratch rows per video (S rounded up; bf16 tile-aligned)


def _sampled_kernel(
    idx_ref,      # [BB, S] int32 (VMEM) — sampled frame indices
    x_ref,        # [BB, F, D] int8 — FULL frame block (u8 bitcast)
    inscale_ref,  # [1, D]
    inbias_ref,   # [1, D]
    w_ref,        # [D, KT] bf16
    ascale_ref,   # [1, KT]
    abias_ref,    # [1, KT]
    out_ref,      # [BB, KT]
    xa_ref,       # scratch [BB*_S_PAD, D] bf16 — matmul-ready rows
    *,
    frames: int,
):
    bb, s = idx_ref.shape
    kt = w_ref.shape[1]
    ki = pl.program_id(1)

    # The x block's index map ignores ki, so Pallas keeps it resident in
    # VMEM across the whole K sweep; the sampling gather runs once per
    # video block (ki == 0) into persistent scratch. Mosaic cannot do
    # dynamic sub-lane slices on packed int8, so the gather is a one-hot
    # int8 MXU select: rows are uint8 bytes reinterpreted as int8 (wraps
    # >127), recovered exactly with & 0xFF after the i32 dot.
    @pl.when(ki == 0)
    def _():
        iota_f = jax.lax.broadcasted_iota(jnp.int32, (s, frames), 1)
        for v in range(bb):
            oh = (iota_f == idx_ref[v, :][:, None]).astype(jnp.int8)
            sel = jax.lax.dot_general(
                oh,
                x_ref[v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            val = jnp.bitwise_and(sel, 255).astype(jnp.float32)
            xa_ref[pl.ds(v * _S_PAD, s), :] = (
                val * inscale_ref[...] + inbias_ref[...]
            ).astype(jnp.bfloat16)

    act = jax.lax.dot_general(
        xa_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    act = jnp.maximum(act * ascale_ref[...] + abias_ref[...], 0.0)
    act = act.reshape(bb, _S_PAD, kt)
    # Scratch rows s.._S_PAD-1 are stale — mask them out of the max.
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (1, _S_PAD, 1), 1) < s
    )
    act = jnp.where(row_ok, act, -1e30)
    out_ref[...] = jnp.max(act, axis=1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_b", "block_k")
)
def dbof_sampled_cluster_maxpool(
    x,          # [B, F, D] uint8 — FULL frames as delivered by the reader
    idx,        # [B, S] int32 — sampled frame indices (each < F)
    w,          # [D, K] f32 cluster weights
    in_scale,   # [D] f32 (dequant x input-BN fold)
    in_bias,    # [D] f32
    act_scale,  # [K] f32 (cluster-BN fold)
    act_bias,   # [K] f32
    interpret: bool = False,
    block_b: int = 8,
    block_k: int = 1024,
):
    """Fused frame-sample gather + cluster + max-pool: [B, K] f32.

    Extends dbof_cluster_maxpool by pulling the sampling gather INTO the
    kernel. The XLA row gather of [B, S, D] from [B, F, D] uint8 is
    pathological when its result must materialise as a Pallas operand
    (~100 ms at the serving config — scalar-ish u8 gather-to-buffer
    lowering; scripts/bench_gather_variants.py), and even a fast gather
    would re-stream the sampled rows once per K-tile. Here the full
    uint8 frame block rides the pipeline once per video block, the S
    sampled rows are selected in-VMEM by a one-hot int8 MXU dot at
    ki==0 into persistent matmul-ready bf16 scratch, and every K-tile
    matmul reads that scratch. Grid order (b, k) keeps the frames
    resident; bf16 W tiles stream instead, overlapped with the MXU
    sweep.

    uint8 only (f32 full-frame blocks would not fit VMEM) — callers with
    float inputs gather on the XLA path and use dbof_cluster_maxpool.
    """
    if x.dtype != jnp.uint8:
        raise ValueError("dbof_sampled_cluster_maxpool requires uint8 x")
    b, f, d = x.shape
    s = idx.shape[1]
    if s > _S_PAD:
        raise ValueError(f"num samples {s} > scratch rows {_S_PAD}")
    k = w.shape[1]
    bb = min(block_b, b)
    b_pad = ((b + bb - 1) // bb) * bb
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, b_pad - b), (0, 0)))
    kt = k if k < block_k else block_k
    if k % kt:
        raise ValueError(f"cluster_size {k} not divisible by tile {kt}")

    out = pl.pallas_call(
        functools.partial(_sampled_kernel, frames=f),
        grid=(b_pad // bb, k // kt),
        in_specs=[
            pl.BlockSpec(
                (bb, s), lambda bi, ki: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, f, d), lambda bi, ki: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d), lambda bi, ki: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, d), lambda bi, ki: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kt), lambda bi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, kt), lambda bi, ki: (bi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb * _S_PAD, d), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * _S_PAD * d * k + 2 * b_pad * s * f * d,
            bytes_accessed=b_pad * f * d
            + (b_pad // bb) * d * k * 2
            + b_pad * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jax.lax.bitcast_convert_type(x, jnp.int8),
        in_scale.reshape(1, d).astype(jnp.float32),
        in_bias.reshape(1, d).astype(jnp.float32),
        w.astype(jnp.bfloat16),
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
