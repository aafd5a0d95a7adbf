"""Fused LSTM recurrence Pallas kernel.

north_star: "bidirectional LSTM/GRU via lax.scan ... as fused Pallas
kernels". The LSTM is split the TPU way:

  1. Input projection X' = X @ W_x for ALL timesteps as ONE [B*F, D] x
     [D, 4H] matmul outside the kernel (MXU-dense, no sequential dep).
  2. This kernel runs the sequential part. Time is the INNERMOST GRID
     dimension — Mosaic executes grid steps sequentially per core, so the
     h/c carries live in VMEM scratch across steps, W_h ([H, 4H] bf16)
     is DMA'd into VMEM once per batch tile, and the Pallas pipeline
     double-buffers the X'_t block stream automatically. No unrolled
     time loop, no per-step HBM carry round trips.

     for (i, t) in grid(B/TB, F):
         z     = h @ W_h + X'[t, tile_i] + bias
         c,h   = lstm_cell(z, c, h)            (TF1 forget_bias = 1.0)
         carry frozen for t >= num_frames      (dynamic_rnn semantics)

Used on the inference/eval path; training keeps the lax.scan graph for
autodiff. Equivalence vs the scan oracle is tested in interpret mode
(tests/test_kernels.py) and on-chip (scripts/validate_kernels_tpu.py).
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
    nf_ref,      # [TB, 1] int32 (VMEM block, per batch tile)
    bias_ref,    # [1, 4H] f32 (VMEM)
    wh_ref,      # [H, 4H] bf16 (HBM; DMA'd once per batch tile)
    xp_ref,      # [1, TB, 4H] bf16 (VMEM block: X'[t, tile])
    outs_ref,    # [1, TB, H] bf16 (VMEM block: outputs[t, tile])
    fh_ref,      # [TB, H] f32 (VMEM block, per batch tile)
    fc_ref,      # [TB, H] f32
    h_sc,        # scratch VMEM (TB, H) f32 — carry, persists over t
    c_sc,        # scratch VMEM (TB, H) f32
    wh_vmem,     # scratch VMEM (H, 4H) bf16
    whsem,       # DMA sem
    *,
    h_dim: int,
    f_steps: int,
    reverse: bool,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        wh_dma = pltpu.make_async_copy(wh_ref, wh_vmem, whsem)
        wh_dma.start()
        h_sc[...] = jnp.zeros_like(h_sc)
        c_sc[...] = jnp.zeros_like(c_sc)
        wh_dma.wait()

    h = h_sc[...]
    c = c_sc[...]
    z = (
        jnp.dot(
            h.astype(jnp.bfloat16),
            wh_vmem[...],
            preferred_element_type=jnp.float32,
        )
        + xp_ref[0].astype(jnp.float32)
        + bias_ref[...]
    )
    gi = z[:, 0 * h_dim : 1 * h_dim]
    gj = z[:, 1 * h_dim : 2 * h_dim]
    gf = z[:, 2 * h_dim : 3 * h_dim]
    go = z[:, 3 * h_dim : 4 * h_dim]
    new_c = c * jax.nn.sigmoid(gf + 1.0) + jax.nn.sigmoid(gi) * jnp.tanh(
        gj
    )
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(go)

    # dynamic_rnn(sequence_length) semantics: freeze past the last real
    # frame. `t` indexes the (possibly flipped) stream.
    orig_t = (f_steps - 1 - t) if reverse else t
    live = nf_ref[...] > orig_t  # [TB, 1] bool
    new_c = jnp.where(live, new_c, c)
    new_h = jnp.where(live, new_h, h)

    h_sc[...] = new_h
    c_sc[...] = new_c
    outs_ref[0] = new_h.astype(jnp.bfloat16)
    fh_ref[...] = new_h
    fc_ref[...] = new_c


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def lstm_recurrence(
    x_proj,      # [F, B, 4H] bf16/f32 — X @ W_x, time-major
    num_frames,  # [B] int32
    wh,          # [H, 4H] f32
    bias,        # [4H] f32
    reverse: bool = False,
    tile_b: int = 128,
    interpret: bool = False,
):
    """Returns (outputs [F, B, H] f32, (final_c, final_h) [B, H] f32).

    `reverse=True` expects x_proj ALREADY flipped in time and returns
    outputs in that flipped order (the caller flips back); the freeze
    mask accounts for the flip internally.
    """
    f, b, g = x_proj.shape
    h_dim = g // 4
    tb = min(tile_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    outs, fh, fc = pl.pallas_call(
        functools.partial(
            _kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),  # time innermost: sequential per tile
        in_specs=[
            pl.BlockSpec(
                (tb, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g), lambda i, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # W_h
            pl.BlockSpec(
                (1, tb, g), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, g), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * f * b_pad * h_dim * g,
            bytes_accessed=f * b_pad * g * 2 + h_dim * g * 2
            + f * b_pad * h_dim * 2,
            transcendentals=4 * f * b_pad * h_dim,
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32).reshape(-1, 1),
        bias.astype(jnp.float32).reshape(1, -1),
        wh.astype(jnp.bfloat16),
        x_proj.astype(jnp.bfloat16),
    )
    return (
        outs[:, :b].astype(jnp.float32),
        (fc[:b], fh[:b]),
    )


def lstm_recurrence_reference(
    x_proj, num_frames, wh, bias, reverse: bool = False
):
    """lax.scan oracle with matching bf16 math."""
    f, b, g = x_proj.shape
    h_dim = g // 4
    wh_b = wh.astype(jnp.bfloat16)
    bias = bias.astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        x, t = inp
        # x rounds through bf16 exactly as the kernel's streamed input.
        z = (
            jnp.dot(
                h.astype(jnp.bfloat16), wh_b,
                preferred_element_type=jnp.float32,
            )
            + x.astype(jnp.bfloat16).astype(jnp.float32)
            + bias
        )
        gi, gj, gf, go = jnp.split(z, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(gf + 1.0) + jax.nn.sigmoid(
            gi
        ) * jnp.tanh(gj)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(go)
        orig_t = (f - 1 - t) if reverse else t
        live = (num_frames.astype(jnp.int32) > orig_t)[:, None]
        new_c = jnp.where(live, new_c, c)
        new_h = jnp.where(live, new_h, h)
        return (new_h, new_c), new_h.astype(jnp.bfloat16)

    init = (
        jnp.zeros((b, h_dim), jnp.float32),
        jnp.zeros((b, h_dim), jnp.float32),
    )
    (h, c), outs = jax.lax.scan(
        step, init, (x_proj, jnp.arange(f))
    )
    return outs.astype(jnp.float32), (c, h)
