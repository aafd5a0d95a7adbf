"""Fused LSTM recurrence Pallas kernel.

north_star: "bidirectional LSTM/GRU via lax.scan ... as fused Pallas
kernels". The LSTM is split the TPU way:

  1. Input projection X' = X @ W_x for ALL timesteps as ONE [B*F, D] x
     [D, 4H] matmul outside the kernel (MXU-dense, no sequential dep).
  2. This kernel runs the sequential part: for t in 0..F-1
         z_t   = X'_t + h @ W_h + bias
         c,h   = lstm_cell(z_t, c, h)            (TF1 forget_bias=1.0)
         carry frozen for t >= num_frames        (dynamic_rnn semantics)
     with W_h ([H, 4H] bf16) RESIDENT IN VMEM for all 300 steps, the
     h/c carries held on-chip, and X'_t slices double-buffer-DMA'd from
     HBM — the per-step HBM traffic of the lax.scan path (carry + gate
     round trips) disappears.

Grid: one program per batch tile (TB rows); each step does a
[TB, H] x [H, 4H] MXU matmul. Used on the inference/eval path; training
keeps the lax.scan graph for autodiff. Equivalence vs the scan oracle is
tested in interpret mode (tests/test_kernels.py).
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
    nf_ref,      # [TB, 1] int32 (VMEM block)
    wh_ref,      # [H, 4H] bf16 (HBM; DMA'd once into scratch — a VMEM
                 #   block spec would be double-buffered by the pipeline
                 #   and blow the 16MB VMEM budget)
    bias_ref,    # [1, 4H] f32
    xp_ref,      # [F, B, 4H] bf16 (HBM; manual DMA)
    outs_ref,    # [F, B, H] bf16 (HBM; manual DMA)
    fh_ref,      # [TB, H] f32 (VMEM output block)
    fc_ref,      # [TB, H] f32
    xslot,       # scratch VMEM (2, TB, 4H) bf16
    wh_vmem,     # scratch VMEM (H, 4H) bf16
    hstage,      # scratch VMEM (TB, H) bf16
    insem,       # DMA sems (2,)
    whsem,       # DMA sem ()
    outsem,      # DMA sem ()
    *,
    tb: int,
    h_dim: int,
    f_steps: int,
    reverse: bool,
):
    i = pl.program_id(0)

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            xp_ref.at[t, pl.ds(i * tb, tb), :],
            xslot.at[slot],
            insem.at[slot],
        )

    wh_dma = pltpu.make_async_copy(wh_ref, wh_vmem, whsem)
    wh_dma.start()
    in_dma(0, 0).start()
    nf = nf_ref[...]  # [TB, 1]
    wh_dma.wait()
    bias = bias_ref[...]
    h0 = jnp.zeros((tb, h_dim), jnp.float32)
    c0 = jnp.zeros((tb, h_dim), jnp.float32)

    def body(t, carry):
        h, c = carry
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < f_steps)
        def _():
            in_dma(jax.lax.rem(t + 1, 2), t + 1).start()

        in_dma(slot, t).wait()
        x = xslot[slot]  # [TB, 4H] bf16

        # NB: wh_vmem is read inside the loop — hoisting the full-buffer
        # read would pin an extra 8.4MB copy on the VMEM stack.
        z = (
            jnp.dot(
                h.astype(jnp.bfloat16), wh_vmem[...],
                preferred_element_type=jnp.float32,
            )
            + x.astype(jnp.float32)
            + bias
        )
        gi = z[:, 0 * h_dim : 1 * h_dim]
        gj = z[:, 1 * h_dim : 2 * h_dim]
        gf = z[:, 2 * h_dim : 3 * h_dim]
        go = z[:, 3 * h_dim : 4 * h_dim]
        new_c = c * jax.nn.sigmoid(gf + 1.0) + jax.nn.sigmoid(
            gi
        ) * jnp.tanh(gj)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(go)

        # dynamic_rnn(sequence_length) semantics: freeze past the last
        # real frame. `t` is a position in the (possibly flipped) stream.
        orig_t = (f_steps - 1 - t) if reverse else t
        live = nf > orig_t  # [TB, 1] bool
        new_c = jnp.where(live, new_c, c)
        new_h = jnp.where(live, new_h, h)

        hstage[...] = new_h.astype(jnp.bfloat16)
        out_dma = pltpu.make_async_copy(
            hstage,
            outs_ref.at[t, pl.ds(i * tb, tb), :],
            outsem,
        )
        out_dma.start()
        out_dma.wait()
        return (new_h, new_c)

    h, c = jax.lax.fori_loop(0, f_steps, body, (h0, c0))
    fh_ref[...] = h
    fc_ref[...] = c


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def lstm_recurrence(
    x_proj,      # [F, B, 4H] bf16/f32 — X @ W_x, time-major
    num_frames,  # [B] int32
    wh,          # [H, 4H] f32
    bias,        # [4H] f32
    reverse: bool = False,
    tile_b: int = 64,
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
            _kernel,
            tb=tb,
            h_dim=h_dim,
            f_steps=f,
            reverse=reverse,
        ),
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec(
                (tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # W_h: HBM, DMA'd once
            pl.BlockSpec(
                (1, g), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # x_proj stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # outputs in HBM
            pl.BlockSpec(
                (tb, h_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tb, g), jnp.bfloat16),
            pltpu.VMEM((h_dim, g), jnp.bfloat16),
            pltpu.VMEM((tb, h_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
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
        wh.astype(jnp.bfloat16),
        bias.astype(jnp.float32).reshape(1, -1),
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
        z = (
            jnp.dot(
                h.astype(jnp.bfloat16), wh_b,
                preferred_element_type=jnp.float32,
            )
            + x.astype(jnp.float32)
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
