"""Trainable fused LSTM recurrence: custom-VJP Pallas kernels.

Forward = kernels/lstm.py's time-as-grid recurrence, additionally
streaming the post-activation gates (sigma_i, tanh_j, sigma_f, sigma_o)
and the cell-state sequence to HBM as residuals. Backward is a second
Pallas kernel running time REVERSED with d_h/d_c carries in VMEM and
W_h^T resident, emitting only dZ (the pre-activation gate grads); the
remaining gradients are plain XLA matmuls OUTSIDE the kernel:

    dX'   = dZ                                (z = x' + h @ W_h + b)
    dW_h  = sum_t h_{t-1}^T dZ_t  = H_prev^T @ dZ   (one big matmul)
    db    = sum_{t,b} dZ

This replaces the lax.scan BPTT — measured 83x slower forward-only at
the NetVLAD-LSTM working point — on the TRAINING path too.

BPTT cell equations (TF1 BasicLSTMCell, forget_bias folded into the
saved sigma_f):
    do = dh * tanh(c_t) * o(1-o)
    dc += dh * o * (1 - tanh(c_t)^2)
    di = dc * j~ * i(1-i);  dj = dc * i * (1-j~^2);  df = dc * c_{t-1} * f(1-f)
    dh_prev = dZ @ W_h^T;   dc_prev = dc * f
Frozen steps (t >= num_frames) pass dh/dc through unchanged and emit
dZ = 0, mirroring the forward freeze.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward (with residual outputs)
# ---------------------------------------------------------------------------


def _fwd_kernel(
    nf_ref,      # [TB, 1] int32
    bias_ref,    # [1, 4H] f32
    wh_ref,      # [H, 4H] bf16 (HBM)
    xp_ref,      # [1, TB, 4H] bf16
    outs_ref,    # [1, TB, H] bf16
    gates_ref,   # [1, TB, 4H] bf16 (residual: post-activation gates)
    cs_ref,      # [1, TB, H] bf16 (residual: c_t)
    fh_ref,      # [TB, H] f32
    fc_ref,      # [TB, H] f32
    h_sc,
    c_sc,
    wh_vmem,
    whsem,
    *,
    h_dim: int,
    f_steps: int,
    reverse: bool,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dma = pltpu.make_async_copy(wh_ref, wh_vmem, whsem)
        dma.start()
        h_sc[...] = jnp.zeros_like(h_sc)
        c_sc[...] = jnp.zeros_like(c_sc)
        dma.wait()

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
    si = jax.nn.sigmoid(z[:, 0 * h_dim : 1 * h_dim])
    tj = jnp.tanh(z[:, 1 * h_dim : 2 * h_dim])
    sf = jax.nn.sigmoid(z[:, 2 * h_dim : 3 * h_dim] + 1.0)
    so = jax.nn.sigmoid(z[:, 3 * h_dim : 4 * h_dim])
    new_c = c * sf + si * tj
    new_h = jnp.tanh(new_c) * so

    orig_t = (f_steps - 1 - t) if reverse else t
    live = nf_ref[...] > orig_t
    new_c = jnp.where(live, new_c, c)
    new_h = jnp.where(live, new_h, h)

    h_sc[...] = new_h
    c_sc[...] = new_c
    outs_ref[0] = new_h.astype(jnp.bfloat16)
    gates_ref[0] = jnp.concatenate(
        [si, tj, sf, so], axis=-1
    ).astype(jnp.bfloat16)
    cs_ref[0] = new_c.astype(jnp.bfloat16)
    fh_ref[...] = new_h
    fc_ref[...] = new_c


def _run_fwd(x_proj, num_frames, wh, bias, reverse, tile_b, interpret):
    f, b, g = x_proj.shape
    h_dim = g // 4
    tb = min(tile_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    vm = pltpu.VMEM
    outs, gates, cs, fh, fc = pl.pallas_call(
        functools.partial(
            _fwd_kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, t: (i, 0), memory_space=vm),
            pl.BlockSpec((1, g), lambda i, t: (0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, tb, g), lambda i, t: (t, i, 0), memory_space=vm
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (1, tb, g), lambda i, t: (t, i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, t: (i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, t: (i, 0), memory_space=vm
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, b_pad, g), jnp.bfloat16),
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
            bytes_accessed=f * b_pad * g * 4 + h_dim * g * 2,
            transcendentals=4 * f * b_pad * h_dim,
        ),
        # tb=128 (full MXU rows, half the sequential grid steps of tb=64)
        # needs ~16.3 MB scoped VMEM — just past XLA's default 16 MB cap,
        # well inside v5e's physical VMEM. Raise the kernel's cap so the
        # tiling is chosen by measurement, not by the default limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32).reshape(-1, 1),
        bias.astype(jnp.float32).reshape(1, -1),
        wh.astype(jnp.bfloat16),
        x_proj.astype(jnp.bfloat16),
    )
    return outs, gates, cs, fh, fc, b_pad, tb


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    nf_ref,      # [TB, 1] int32
    dfh_ref,     # [TB, H] f32 (seed: d final_h)
    dfc_ref,     # [TB, H] f32 (seed: d final_c)
    whT_ref,     # [4H, H] bf16 (HBM)
    dout_ref,    # [1, TB, H] bf16  (upstream d outs[t])
    gates_ref,   # [1, TB, 4H] bf16
    cs_ref,      # [1, TB, H] bf16  (c_t)
    csp_ref,     # [1, TB, H] bf16  (c_{t-1})
    dz_ref,      # [1, TB, 4H] bf16 (output)
    dh_sc,       # VMEM (TB, H) f32 carry
    dc_sc,       # VMEM (TB, H) f32 carry
    whT_vmem,    # VMEM (4H, H) bf16
    whsem,
    *,
    h_dim: int,
    f_steps: int,
    reverse: bool,
):
    # Grid position r runs 0..F-1; the step being differentiated is
    # t = F-1-r (reverse time). Block index maps handle the flip.
    r = pl.program_id(1)
    t = f_steps - 1 - r

    @pl.when(r == 0)
    def _():
        dma = pltpu.make_async_copy(whT_ref, whT_vmem, whsem)
        dma.start()
        # Seed the carries with the final-state cotangents.
        dh_sc[...] = dfh_ref[...]
        dc_sc[...] = dfc_ref[...]
        dma.wait()

    dh = dh_sc[...] + dout_ref[0].astype(jnp.float32)
    dc = dc_sc[...]

    g = gates_ref[0].astype(jnp.float32)
    si = g[:, 0 * h_dim : 1 * h_dim]
    tj = g[:, 1 * h_dim : 2 * h_dim]
    sf = g[:, 2 * h_dim : 3 * h_dim]
    so = g[:, 3 * h_dim : 4 * h_dim]
    c_t = cs_ref[0].astype(jnp.float32)
    c_p = csp_ref[0].astype(jnp.float32)

    tc = jnp.tanh(c_t)
    do = dh * tc * so * (1.0 - so)
    dc_full = dc + dh * so * (1.0 - tc * tc)
    di = dc_full * tj * si * (1.0 - si)
    dj = dc_full * si * (1.0 - tj * tj)
    df = dc_full * c_p * sf * (1.0 - sf)

    orig_t = (f_steps - 1 - t) if reverse else t
    live = nf_ref[...] > orig_t

    dz = jnp.concatenate([di, dj, df, do], axis=-1)
    dz = jnp.where(live, dz, 0.0)

    dh_prev = jnp.dot(
        dz.astype(jnp.bfloat16),
        whT_vmem[...],
        preferred_element_type=jnp.float32,
    )
    dc_prev = dc_full * sf

    # Frozen steps pass gradients straight through.
    dh_sc[...] = jnp.where(live, dh_prev, dh)
    dc_sc[...] = jnp.where(live, dc_prev, dc)
    dz_ref[0] = dz.astype(jnp.bfloat16)


def _run_bwd(
    douts, dfh, dfc, gates, cs, num_frames, wh, reverse, tile_b, interpret
):
    f, b_pad, g = gates.shape
    h_dim = g // 4
    tb = min(tile_b, _round_up(b_pad, 8))

    # c_{t-1} stream: zeros at t=0.
    cs_prev = jnp.concatenate(
        [jnp.zeros_like(cs[:1]), cs[:-1]], axis=0
    )

    vm = pltpu.VMEM
    dz = pl.pallas_call(
        functools.partial(
            _bwd_kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, r: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (tb, h_dim), lambda i, r: (i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, r: (i, 0), memory_space=vm
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # W_h^T
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, g),
                lambda i, r, _f=f: (_f - 1 - r, i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0),
                memory_space=vm,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tb, g),
            lambda i, r, _f=f: (_f - 1 - r, i, 0),
            memory_space=vm,
        ),
        out_shape=jax.ShapeDtypeStruct((f, b_pad, g), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((g, h_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        # Same raised cap as the forward: tb=128 sits just over the
        # default 16 MB scoped-vmem limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32).reshape(-1, 1),
        dfh.astype(jnp.float32),
        dfc.astype(jnp.float32),
        jnp.transpose(wh).astype(jnp.bfloat16),
        douts.astype(jnp.bfloat16),
        gates,
        cs,
        cs_prev,
    )
    return dz


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def lstm_recurrence_trainable(
    x_proj, num_frames, wh, bias,
    reverse: bool = False, tile_b: int = 128, interpret: bool = False,
):
    """Differentiable fused recurrence.

    Same contract as kernels/lstm.py :: lstm_recurrence; gradients flow to
    x_proj, wh, bias (num_frames is integer data).
    """
    outs, gates, cs, fh, fc, b_pad, tb = _run_fwd(
        x_proj, num_frames, wh, bias, reverse, tile_b, interpret
    )
    b = x_proj.shape[1]
    return outs[:, :b].astype(jnp.float32), (fc[:b], fh[:b])


def _fwd_rule(
    x_proj, num_frames, wh, bias, reverse, tile_b, interpret
):
    outs, gates, cs, fh, fc, b_pad, tb = _run_fwd(
        x_proj, num_frames, wh, bias, reverse, tile_b, interpret
    )
    b = x_proj.shape[1]
    primal = (outs[:, :b].astype(jnp.float32), (fc[:b], fh[:b]))
    residuals = (outs, gates, cs, num_frames, wh, b, b_pad)
    return primal, residuals


def _bwd_rule(reverse, tile_b, interpret, residuals, cotangents):
    outs, gates, cs, num_frames, wh, b, b_pad = residuals
    douts, (dfc, dfh) = cotangents
    f = outs.shape[0]
    g = gates.shape[2]
    h_dim = g // 4

    if b_pad != b:
        douts = jnp.pad(douts, ((0, 0), (0, b_pad - b), (0, 0)))
        dfh = jnp.pad(dfh, ((0, b_pad - b), (0, 0)))
        dfc = jnp.pad(dfc, ((0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    dz = _run_bwd(
        douts, dfh, dfc, gates, cs, num_frames, wh, reverse, tile_b,
        interpret,
    )

    dz32 = dz.astype(jnp.float32)
    # h_{t-1} stream (zeros at t=0)
    h_prev = jnp.concatenate(
        [jnp.zeros_like(outs[:1]), outs[:-1]], axis=0
    )
    dwh = jnp.einsum(
        "fbh,fbg->hg",
        h_prev.astype(jnp.bfloat16),
        dz.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    dbias = jnp.sum(dz32, axis=(0, 1))
    dx = dz32[:, :b]
    return (dx, None, dwh, dbias)


lstm_recurrence_trainable.defvjp(_fwd_rule, _bwd_rule)
