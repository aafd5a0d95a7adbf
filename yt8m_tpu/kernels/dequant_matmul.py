"""Fused dequantize + per-feature affine + matmul Pallas kernel.

The shared hot op of the frame models (BASELINE.json north_star: "fused
Pallas kernels"): uint8 frame features hit a large dense layer —

    y[M, N] = (u8[M, D] * scale[D] + bias[D]) @ w[D, N]

with scale/bias folding BOTH the YT-8M dequantize affine (utils.py ::
Dequantize) and an inference-mode BatchNorm. Fusing keeps the dequantized
f32 activations out of HBM entirely: the kernel streams uint8 tiles into
VMEM, applies the affine on the VPU, and feeds the MXU directly — at
batch 2048 x 300 frames that saves ~2.6 GB of HBM round trip per step
vs materialising the float input.

Library op for uint8-input dense layers (the integrated NetVLAD/attention
kernels perform their own in-register dequantize; DBoF's sampled-frame
path dequantizes only 30/300 frames, where XLA's fusion already avoids
the HBM round trip). kernel==jnp equivalence tested in
tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_ref, scale_ref, bias_ref, w_ref, out_ref, *, compute_dtype):
    # Mosaic has no direct u8->f32 cast; hop through int32.
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    x = x * scale_ref[...] + bias_ref[...]  # [TM, D] * [1, D] + [1, D]
    out_ref[...] = jnp.dot(
        x.astype(compute_dtype),
        w_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def dequant_affine_matmul(
    x_u8,
    w,
    scale,
    bias,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
):
    """y = (x_u8 * scale + bias) @ w.

    x_u8 [M, D] uint8; w [D, N] float32; scale/bias [D] float32.
    Returns [M, N] float32. M and N are padded to block multiples
    internally; D must be a multiple of 128 (1152 = 9*128 for YT-8M).
    """
    m, d = x_u8.shape
    d2, n = w.shape
    assert d == d2, (d, d2)
    compute_dtype = jnp.bfloat16 if d >= 512 else jnp.float32

    block_m = min(block_m, max(8, m))
    block_n = min(block_n, max(128, n))
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x_u8 = jnp.pad(x_u8, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        w = jnp.pad(w, ((0, 0), (0, n_pad - n)))

    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=[
            pl.BlockSpec(
                (block_m, d), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, block_n), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * d * n_pad,
            bytes_accessed=m_pad * d + d * n_pad * 4 + m_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_u8, scale.reshape(1, d), bias.reshape(1, d), w)
    return out[:m, :n]


def dequant_affine_matmul_reference(x_u8, w, scale, bias, compute_dtype=None):
    """jnp oracle for the kernel (used in tests and as CPU fallback).

    compute_dtype mirrors the kernel's MXU dtype choice when given.
    """
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x_u8.shape[1] >= 512 else jnp.float32
    x = x_u8.astype(jnp.float32) * scale[None, :] + bias[None, :]
    return jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
