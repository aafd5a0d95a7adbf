"""Trainable fused GRU recurrence: custom-VJP Pallas kernels
(companion to kernels/lstm_train.py).

Forward streams the residuals (post-sigmoid gates r,u and the
post-tanh candidate c~); the reverse-time backward kernel emits the
pre-activation gradients dA_g = [da_r, da_u] and dA_c with the dh carry
in VMEM and both transposed recurrent weights resident. Outside the
kernel, plain XLA matmuls finish the job:

    dXg = dA_g;  dXc = dA_c
    dWhg = sum_t h_{t-1}^T dA_g;   dWhc = sum_t (r_t * h_{t-1})^T dA_c
    dbg  = sum dA_g;               dbc  = sum dA_c

BPTT equations (TF1 GRUCell):
    da_u    = dh * (h_prev - c~) * u(1-u)
    dc~     = dh * (1-u);          da_c = dc~ * (1 - c~^2)
    d(rh)   = dA_c @ Whc^T
    da_r    = d(rh) * h_prev * r(1-r)
    dh_prev = dh*u + d(rh)*r + [da_r, da_u] @ Whg^T
Frozen steps (t >= num_frames) pass dh through and emit zeros.
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
    nf_ref, bg_ref, bc_ref, whg_ref, whc_ref, xg_ref, xc_ref,
    outs_ref, gates_ref, cand_ref, fh_ref,
    h_sc, whg_vmem, whc_vmem, whsem,
    *, h_dim: int, f_steps: int, reverse: bool,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        d1 = pltpu.make_async_copy(whg_ref, whg_vmem, whsem.at[0])
        d2 = pltpu.make_async_copy(whc_ref, whc_vmem, whsem.at[1])
        d1.start()
        d2.start()
        h_sc[...] = jnp.zeros_like(h_sc)
        d1.wait()
        d2.wait()

    h = h_sc[...]
    gates = jax.nn.sigmoid(
        jnp.dot(
            h.astype(jnp.bfloat16), whg_vmem[...],
            preferred_element_type=jnp.float32,
        )
        + xg_ref[0].astype(jnp.float32)
        + bg_ref[...]
    )
    r = gates[:, :h_dim]
    u = gates[:, h_dim:]
    cand = jnp.tanh(
        jnp.dot(
            (r * h).astype(jnp.bfloat16), whc_vmem[...],
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
    gates_ref[0] = gates.astype(jnp.bfloat16)
    cand_ref[0] = cand.astype(jnp.bfloat16)
    fh_ref[...] = new_h


def _run_fwd(xg, xc, num_frames, whg, whc, bg, bc, reverse, tile_b,
             interpret):
    f, b, g2 = xg.shape
    h_dim = g2 // 2
    tb = min(tile_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    if b_pad != b:
        xg = jnp.pad(xg, ((0, 0), (0, b_pad - b), (0, 0)))
        xc = jnp.pad(xc, ((0, 0), (0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    vm = pltpu.VMEM
    outs, gates, cand, fh = pl.pallas_call(
        functools.partial(
            _fwd_kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, t: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (1, 2 * h_dim), lambda i, t: (0, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (1, h_dim), lambda i, t: (0, 0), memory_space=vm
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, tb, 2 * h_dim), lambda i, t: (t, i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0), memory_space=vm
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (1, tb, 2 * h_dim), lambda i, t: (t, i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim), lambda i, t: (t, i, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (tb, h_dim), lambda i, t: (i, 0), memory_space=vm
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, b_pad, 2 * h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b_pad, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, 2 * h_dim), jnp.bfloat16),
            pltpu.VMEM((h_dim, h_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
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
    return outs, gates, cand, fh, b_pad, tb


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    nf_ref, dfh_ref, whgT_ref, whcT_ref,
    dout_ref, gates_ref, cand_ref, hprev_ref,
    dag_ref, dac_ref,
    dh_sc, whgT_vmem, whcT_vmem, whsem,
    *, h_dim: int, f_steps: int, reverse: bool,
):
    r_id = pl.program_id(1)
    t = f_steps - 1 - r_id

    @pl.when(r_id == 0)
    def _():
        d1 = pltpu.make_async_copy(whgT_ref, whgT_vmem, whsem.at[0])
        d2 = pltpu.make_async_copy(whcT_ref, whcT_vmem, whsem.at[1])
        d1.start()
        d2.start()
        dh_sc[...] = dfh_ref[...]
        d1.wait()
        d2.wait()

    dh = dh_sc[...] + dout_ref[0].astype(jnp.float32)

    gts = gates_ref[0].astype(jnp.float32)
    r = gts[:, :h_dim]
    u = gts[:, h_dim:]
    c = cand_ref[0].astype(jnp.float32)
    hp = hprev_ref[0].astype(jnp.float32)

    da_u = dh * (hp - c) * u * (1.0 - u)
    dc = dh * (1.0 - u)
    da_c = dc * (1.0 - c * c)
    drh = jnp.dot(
        da_c.astype(jnp.bfloat16), whcT_vmem[...],
        preferred_element_type=jnp.float32,
    )
    da_r = drh * hp * r * (1.0 - r)
    da_g = jnp.concatenate([da_r, da_u], axis=-1)

    orig_t = (f_steps - 1 - t) if reverse else t
    live = nf_ref[...] > orig_t
    da_g = jnp.where(live, da_g, 0.0)
    da_c = jnp.where(live, da_c, 0.0)

    dh_prev = (
        dh * u
        + drh * r
        + jnp.dot(
            da_g.astype(jnp.bfloat16), whgT_vmem[...],
            preferred_element_type=jnp.float32,
        )
    )
    dh_sc[...] = jnp.where(live, dh_prev, dh)
    dag_ref[0] = da_g.astype(jnp.bfloat16)
    dac_ref[0] = da_c.astype(jnp.bfloat16)


def _run_bwd(douts, dfh, gates, cand, hprev, num_frames, whg, whc,
             reverse, tile_b, interpret):
    f, b_pad, g2 = gates.shape
    h_dim = g2 // 2
    tb = min(tile_b, _round_up(b_pad, 8))

    vm = pltpu.VMEM
    dag, dac = pl.pallas_call(
        functools.partial(
            _bwd_kernel, h_dim=h_dim, f_steps=f, reverse=reverse
        ),
        grid=(b_pad // tb, f),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, r: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (tb, h_dim), lambda i, r: (i, 0), memory_space=vm
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, 2 * h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tb, 2 * h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
            pl.BlockSpec(
                (1, tb, h_dim),
                lambda i, r, _f=f: (_f - 1 - r, i, 0), memory_space=vm,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b_pad, 2 * h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, b_pad, h_dim), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((2 * h_dim, h_dim), jnp.bfloat16),
            pltpu.VMEM((h_dim, h_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32).reshape(-1, 1),
        dfh.astype(jnp.float32),
        jnp.transpose(whg).astype(jnp.bfloat16),
        jnp.transpose(whc).astype(jnp.bfloat16),
        douts.astype(jnp.bfloat16),
        gates,
        cand,
        hprev,
    )
    return dag, dac


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def gru_recurrence_trainable(
    xg, xc, num_frames, whg, whc, bg, bc,
    reverse: bool = False, tile_b: int = 64, interpret: bool = False,
):
    """Differentiable fused GRU recurrence; same contract as
    kernels/gru.py :: gru_recurrence."""
    outs, gates, cand, fh, b_pad, tb = _run_fwd(
        xg, xc, num_frames, whg, whc, bg, bc, reverse, tile_b, interpret
    )
    b = xg.shape[1]
    return outs[:, :b].astype(jnp.float32), fh[:b]


def _fwd_rule(xg, xc, num_frames, whg, whc, bg, bc, reverse, tile_b,
              interpret):
    outs, gates, cand, fh, b_pad, tb = _run_fwd(
        xg, xc, num_frames, whg, whc, bg, bc, reverse, tile_b, interpret
    )
    b = xg.shape[1]
    primal = (outs[:, :b].astype(jnp.float32), fh[:b])
    residuals = (outs, gates, cand, num_frames, whg, whc, b, b_pad)
    return primal, residuals


def _bwd_rule(reverse, tile_b, interpret, residuals, cotangents):
    outs, gates, cand, num_frames, whg, whc, b, b_pad = residuals
    douts, dfh = cotangents
    f = outs.shape[0]

    if b_pad != b:
        douts = jnp.pad(douts, ((0, 0), (0, b_pad - b), (0, 0)))
        dfh = jnp.pad(dfh, ((0, b_pad - b), (0, 0)))
        num_frames = jnp.pad(num_frames, (0, b_pad - b))

    hprev = jnp.concatenate(
        [jnp.zeros_like(outs[:1]), outs[:-1]], axis=0
    )
    dag, dac = _run_bwd(
        douts, dfh, gates, cand, hprev, num_frames, whg, whc,
        reverse, tile_b, interpret,
    )

    h_dim = cand.shape[2]
    r_seq = gates[:, :, :h_dim]
    rh = (
        r_seq.astype(jnp.float32) * hprev.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    dwhg = jnp.einsum(
        "fbh,fbg->hg", hprev.astype(jnp.bfloat16), dag,
        preferred_element_type=jnp.float32,
    )
    dwhc = jnp.einsum(
        "fbh,fbg->hg", rh, dac, preferred_element_type=jnp.float32
    )
    dag32 = dag.astype(jnp.float32)
    dac32 = dac.astype(jnp.float32)
    dbg = jnp.sum(dag32, axis=(0, 1))
    dbc = jnp.sum(dac32, axis=(0, 1))
    return (
        dag32[:, :b], dac32[:, :b], None, dwhg, dwhc, dbg, dbc
    )


gru_recurrence_trainable.defvjp(_fwd_rule, _bwd_rule)
