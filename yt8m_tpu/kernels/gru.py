"""Fused GRU recurrence Pallas kernel (companion to kernels/lstm.py).

Same decomposition: the input projections x@Wx_g ([F,B,2H]) and x@Wx_c
([F,B,H]) are batched MXU matmuls outside; this kernel runs the
sequential part with time as the innermost grid dimension (sequential per
core), the h carry in VMEM scratch, and both recurrent weights DMA'd into
VMEM once per batch tile:

    g_t  = sigmoid(xg_t + h @ Whg + bg);  r, u = split(g_t)
    c_t  = tanh(xc_t + (r * h) @ Whc + bc)
    h    = u * h + (1 - u) * c_t,   frozen for t >= num_frames

Cell equations match TF1 GRUCell (gate bias init 1.0 lives in the
parameters, not here). Inference-path only; lax.scan remains the
autodiff/train path.
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
    nf_ref,      # [TB, 1] int32
    bg_ref,      # [1, 2H] f32
    bc_ref,      # [1, H] f32
    whg_ref,     # [H, 2H] bf16 (HBM; DMA'd once per batch tile)
    whc_ref,     # [H, H] bf16 (HBM; DMA'd once per batch tile)
    xg_ref,      # [1, TB, 2H] bf16 (VMEM block: Xg[t, tile])
    xc_ref,      # [1, TB, H] bf16 (VMEM block: Xc[t, tile])
    outs_ref,    # [1, TB, H] bf16
    fh_ref,      # [TB, H] f32
    h_sc,        # scratch VMEM (TB, H) f32
    whg_vmem,    # scratch VMEM (H, 2H) bf16
    whc_vmem,    # scratch VMEM (H, H) bf16
    whsem,       # DMA sems (2,)
    *,
    h_dim: int,
    f_steps: int,
    reverse: bool,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        whg_dma = pltpu.make_async_copy(whg_ref, whg_vmem, whsem.at[0])
        whc_dma = pltpu.make_async_copy(whc_ref, whc_vmem, whsem.at[1])
        whg_dma.start()
        whc_dma.start()
        h_sc[...] = jnp.zeros_like(h_sc)
        whg_dma.wait()
        whc_dma.wait()

    h = h_sc[...]
    gates = jax.nn.sigmoid(
        jnp.dot(
            h.astype(jnp.bfloat16),
            whg_vmem[...],
            preferred_element_type=jnp.float32,
        )
        + xg_ref[0].astype(jnp.float32)
        + bg_ref[...]
    )
    r = gates[:, :h_dim]
    u = gates[:, h_dim:]
    cand = jnp.tanh(
        jnp.dot(
            (r * h).astype(jnp.bfloat16),
            whc_vmem[...],
            preferred_element_type=jnp.float32,
        )
        + xc_ref[0].astype(jnp.float32)
        + bc_ref[...]
    )
    new_h = u * h + (1.0 - u) * cand

    orig_t = (f_steps - 1 - t) if reverse else t
    live = nf_ref[...] > orig_t
    new_h = jnp.where(live, new_h, h)

    h_sc[...] = new_h
    outs_ref[0] = new_h.astype(jnp.bfloat16)
    fh_ref[...] = new_h


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def gru_recurrence(
    xg,          # [F, B, 2H] — X @ Wx_gates, time-major
    xc,          # [F, B, H]  — X @ Wx_candidate
    num_frames,  # [B] int32
    whg,         # [H, 2H] f32 recurrent gate weights
    whc,         # [H, H] f32 recurrent candidate weights
    bg,          # [2H] f32
    bc,          # [H] f32
    reverse: bool = False,
    tile_b: int = 128,
    interpret: bool = False,
):
    """Returns (outputs [F, B, H] f32, final_h [B, H] f32)."""
    f, b, g2 = xg.shape
    h_dim = g2 // 2
    tb = min(tile_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    if b_pad != b:
        xg = jnp.pad(xg, ((0, 0), (0, b_pad - b), (0, 0)))
        xc = jnp.pad(xc, ((0, 0), (0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    outs, fh = pl.pallas_call(
        functools.partial(
            _kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),
        in_specs=[
            pl.BlockSpec(
                (tb, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2 * h_dim), lambda i, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h_dim), lambda i, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # Whg
            pl.BlockSpec(memory_space=pltpu.HBM),  # Whc
            pl.BlockSpec(
                (1, tb, 2 * h_dim), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0),
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
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, 2 * h_dim), jnp.bfloat16),
            pltpu.VMEM((h_dim, h_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * f * b_pad * h_dim * 3 * h_dim,
            bytes_accessed=f * b_pad * 3 * h_dim * 2
            + 3 * h_dim * h_dim * 2 + f * b_pad * h_dim * 2,
            transcendentals=3 * f * b_pad * h_dim,
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32).reshape(-1, 1),
        bg.astype(jnp.float32).reshape(1, -1),
        bc.astype(jnp.float32).reshape(1, -1),
        whg.astype(jnp.bfloat16),
        whc.astype(jnp.bfloat16),
        xg.astype(jnp.bfloat16),
        xc.astype(jnp.bfloat16),
    )
    return outs[:, :b].astype(jnp.float32), fh[:b]


def gru_recurrence_reference(
    xg, xc, num_frames, whg, whc, bg, bc, reverse: bool = False
):
    """lax.scan oracle with matching bf16 math."""
    f, b, g2 = xg.shape
    h_dim = g2 // 2
    whg_b = whg.astype(jnp.bfloat16)
    whc_b = whc.astype(jnp.bfloat16)

    def step(h, inp):
        xg_t, xc_t, t = inp
        gates = jax.nn.sigmoid(
            jnp.dot(
                h.astype(jnp.bfloat16), whg_b,
                preferred_element_type=jnp.float32,
            )
            + xg_t.astype(jnp.bfloat16).astype(jnp.float32)
            + bg
        )
        r, u = gates[:, :h_dim], gates[:, h_dim:]
        cand = jnp.tanh(
            jnp.dot(
                (r * h).astype(jnp.bfloat16), whc_b,
                preferred_element_type=jnp.float32,
            )
            + xc_t.astype(jnp.bfloat16).astype(jnp.float32)
            + bc
        )
        new_h = u * h + (1.0 - u) * cand
        orig_t = (f - 1 - t) if reverse else t
        live = (num_frames.astype(jnp.int32) > orig_t)[:, None]
        new_h = jnp.where(live, new_h, h)
        return new_h, new_h.astype(jnp.bfloat16)

    h0 = jnp.zeros((b, h_dim), jnp.float32)
    h, outs = jax.lax.scan(step, h0, (xg, xc, jnp.arange(f)))
    return outs.astype(jnp.float32), h
