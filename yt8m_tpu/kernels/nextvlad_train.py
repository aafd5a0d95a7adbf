"""Trainable fused NeXtVLAD aggregation: custom-VJP Pallas kernels.

Why: the NeXtVLAD train step is NOT Adam-bound — the on-chip profile
(scripts/profile_nextvlad_train.py, BENCH_NOTES r3) shows the
aggregation's value_and_grad is 37.2 of the 43.1 ms step (~86%) at
B=256, because the XLA graph materialises xe [B, F, lambda*D] plus two
[B, F, G, K] tensors in HBM in the forward AND their cotangents in the
backward. The serving kernel (kernels/nextvlad.py) already removed
those intermediates for inference at 2.28x; this module makes the same
fusion differentiable.

Key observation: the aggregation's array inputs that need gradients are
only the FIVE WEIGHTS (expansion, attention w/b, clusters, centers) —
the frames come straight from the reader, so there is no input
cotangent. Weight gradients are accumulated ACROSS the per-video grid
inside the backward kernel (TPU Pallas grids are sequential, so an
output block with a constant index_map acts as a VMEM accumulator),
which means the backward writes NOTHING per-video to HBM.

Flash-style zero-residual design: the forward IS the serving kernel
(normalised descriptors, one VMEM program per video); the backward
recomputes x, xe, alpha and the per-group softmax from the saved primal
inputs, rebuilds the pre-norm descriptor + its norm, back-propagates
through the intra-norm, the grouped aggregation, the masked
softmax*sigmoid assignment, and the three projections, and accumulates

    d_Wc += xe^T @ d_act        d_Wa += xe^T @ d_preattn
    d_We += x^T  @ d_xe         d_ab += sum_f d_preattn
    d_centers += -a_sum^T * dv

in five resident f32 VMEM accumulators (~29 MB at the reference config;
resident bf16 weights + their pre-transposed copies add ~21 MB, so the
kernel asks for a raised vmem limit like the serving kernel does).

Matmul precision matches the repo's other train cores
(kernels/netvlad_train.py, lstm_train.py): cotangents are cast to bf16
for the MXU with f32 accumulation — the bf16-class deviation vs
autodiff of the jnp graph is covered by the equivalence tests
(tests/test_nextvlad_train_kernel.py) and the model-level loss-parity
test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yt8m_tpu.data.quantize import DEQUANT_BIAS, DEQUANT_SCALE
from yt8m_tpu.kernels.nextvlad import nextvlad_aggregate


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bwd_kernel(
    nf_ref,        # scalar prefetch: [B] int32
    frames_ref,    # [1, Fp, D] (u8 or f32)
    dy_ref,        # [1, Kp, Pp] f32 cotangent of the normalised output
    we_ref,        # [D, G*Pp] bf16/dtype (group-major padded)
    wa_ref,        # [G*Pp, Ga]
    ab_ref,        # [1, Ga] f32
    wc_ref,        # [G*Pp, G*Kp]
    wct_ref,       # [G*Kp, G*Pp] (pre-transposed)
    wat_ref,       # [Ga, G*Pp]  (pre-transposed)
    centers_ref,   # [Kp, Pp] f32
    dwe_ref,       # out [D, G*Pp] f32   (accumulated across the grid)
    dwa_ref,       # out [G*Pp, Ga] f32
    dab_ref,       # out [1, Ga] f32
    dwc_ref,       # out [G*Pp, G*Kp] f32
    dce_ref,       # out [Kp, Pp] f32
    *,
    g: int,
    k: int,
    kp: int,
    pp: int,
    deq_scale: float,
    deq_bias: float,
    is_u8: bool,
    dtype,
):
    i = pl.program_id(0)
    fp = frames_ref.shape[1]

    @pl.when(i == 0)
    def _zero():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dab_ref[...] = jnp.zeros_like(dab_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dce_ref[...] = jnp.zeros_like(dce_ref)

    # ---- recompute the forward (identical math to kernels/nextvlad.py)
    if is_u8:
        x = frames_ref[0].astype(jnp.int32).astype(jnp.float32)
        x = x * deq_scale + deq_bias
    else:
        x = frames_ref[0].astype(jnp.float32)
    xb = x.astype(dtype)                                   # [Fp, D]
    xe = jnp.dot(
        xb, we_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)                                        # [Fp, G*Pp]
    alpha = jax.nn.sigmoid(
        jnp.dot(
            xe, wa_ref[...].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + ab_ref[...]
    )                                                      # [Fp, Ga] f32
    act = jnp.dot(
        xe, wc_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    )                                                      # [Fp, G*Kp]

    nf = nf_ref[i]
    rowmask = jax.lax.broadcasted_iota(jnp.int32, (fp, kp), 0) < nf
    colvalid = jax.lax.broadcasted_iota(jnp.int32, (fp, kp), 1) < k

    def softmax_g(gi):
        act_g = act[:, gi * kp:(gi + 1) * kp]
        act_g = jnp.where(colvalid, act_g, -1e30)
        m = jnp.max(act_g, axis=-1, keepdims=True)
        e = jnp.exp(act_g - m)
        return e / jnp.sum(e, axis=-1, keepdims=True)      # [Fp, Kp]

    vlad = jnp.zeros((kp, pp), jnp.float32)
    a_sum = jnp.zeros((1, kp), jnp.float32)
    # Evaluate each group's softmax ONCE and keep the [Fp, Kp] tiles
    # live for the backward loop below (~1.2 MB f32 at reference
    # shapes) instead of recomputing and relying on Mosaic CSE to
    # dedupe the exp work (ADVICE r3).
    sms = [softmax_g(gi) for gi in range(g)]
    for gi in range(g):
        sm = sms[gi]
        assign_g = jnp.where(rowmask, sm * alpha[:, gi:gi + 1], 0.0)
        a_sum = a_sum + jnp.sum(assign_g, axis=0, keepdims=True)
        vlad = vlad + jax.lax.dot_general(
            assign_g.astype(dtype),
            xe[:, gi * pp:(gi + 1) * pp],
            dimension_numbers=(((0,), (0,)), ((), ())),    # [Kp, Pp]
            preferred_element_type=jnp.float32,
        )
    vlad = vlad - a_sum.T * centers_ref[...]

    # ---- intra-norm VJP:  y = v / sqrt(max(sum v^2, eps))
    sum_sq = jnp.sum(vlad * vlad, axis=1, keepdims=True)   # [Kp, 1]
    n = jnp.sqrt(jnp.maximum(sum_sq, 1e-12))
    y = vlad / n
    dy = dy_ref[0].astype(jnp.float32)                     # [Kp, Pp]
    # where the clamp is active, n is constant w.r.t. v
    ydotdy = jnp.sum(y * dy, axis=1, keepdims=True)
    dv = jnp.where(sum_sq > 1e-12, (dy - y * ydotdy) / n, dy / n)

    # ---- aggregation VJP
    # a_sum enters as  v -= a_sum^T * centers:
    cdot = jnp.sum(centers_ref[...] * dv, axis=1, keepdims=True)  # [Kp,1]
    dce_ref[...] += -a_sum.T * dv

    rowmaskf = rowmask.astype(jnp.float32)
    dvb = dv.astype(dtype)
    d_act_parts = []
    d_xe_parts = []
    d_pre = jnp.zeros((fp, alpha.shape[1]), jnp.float32)   # [Fp, Ga]
    col = jax.lax.broadcasted_iota(
        jnp.int32, (fp, alpha.shape[1]), 1
    )
    for gi in range(g):
        sm = sms[gi]
        alpha_g = alpha[:, gi:gi + 1]
        assign_g = jnp.where(rowmask, sm * alpha_g, 0.0)
        xg_g = xe[:, gi * pp:(gi + 1) * pp]
        # d_assign = xg @ dv^T - (centers . dv) broadcast over frames
        d_assign = jax.lax.dot_general(
            xg_g, dvb,
            dimension_numbers=(((1,), (1,)), ((), ())),    # [Fp, Kp]
            preferred_element_type=jnp.float32,
        ) - cdot.T
        # assign = softmax * alpha * rowmask
        d_alpha_g = jnp.sum(
            d_assign * sm * rowmaskf, axis=1, keepdims=True
        )                                                  # [Fp, 1]
        d_sm = d_assign * alpha_g * rowmaskf
        d_act_g = sm * (
            d_sm - jnp.sum(sm * d_sm, axis=-1, keepdims=True)
        )                                                  # [Fp, Kp]
        d_pre_g = d_alpha_g * alpha_g * (1.0 - alpha_g)    # sigmoid VJP
        d_xg_g = jnp.dot(
            assign_g.astype(dtype), dvb,
            preferred_element_type=jnp.float32,
        )                                                  # [Fp, Pp]
        d_act_parts.append(d_act_g)
        d_xe_parts.append(d_xg_g)
        d_pre = d_pre + jnp.where(col == gi, d_pre_g, 0.0)

    d_act = jnp.concatenate(d_act_parts, axis=1)           # [Fp, G*Kp]
    d_actb = d_act.astype(dtype)
    d_preb = d_pre.astype(dtype)
    d_xe = (
        jnp.concatenate(d_xe_parts, axis=1)                # aggregation
        + jnp.dot(
            d_actb, wct_ref[...].astype(dtype),
            preferred_element_type=jnp.float32,
        )                                                  # clusters
        + jnp.dot(
            d_preb, wat_ref[...].astype(dtype),
            preferred_element_type=jnp.float32,
        )                                                  # attention
    )                                                      # [Fp, G*Pp]

    # ---- weight-gradient accumulation (f32, across the grid)
    dwc_ref[...] += jax.lax.dot_general(
        xe, d_actb,
        dimension_numbers=(((0,), (0,)), ((), ())),        # [G*Pp, G*Kp]
        preferred_element_type=jnp.float32,
    )
    dwa_ref[...] += jax.lax.dot_general(
        xe, d_preb,
        dimension_numbers=(((0,), (0,)), ((), ())),        # [G*Pp, Ga]
        preferred_element_type=jnp.float32,
    )
    dab_ref[...] += jnp.sum(d_pre, axis=0, keepdims=True)
    dwe_ref[...] += jax.lax.dot_general(
        xb, d_xe.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),        # [D, G*Pp]
        preferred_element_type=jnp.float32,
    )


def _pad_weights(expand_w, attn_w, attn_b, cluster_w, centers,
                 g, p, k, pp, kp, ga, wdt):
    """Group-major lane-padded layouts (same scheme as the serving
    kernel — see kernels/nextvlad.py docstring) plus pre-transposed
    copies for the backward's d_xe matmuls."""
    d = expand_w.shape[0]
    we = jnp.pad(
        expand_w.astype(wdt).reshape(d, g, p),
        ((0, 0), (0, 0), (0, pp - p)),
    ).reshape(d, g * pp)
    wa = jnp.pad(
        attn_w.astype(wdt).reshape(g, p, g),
        ((0, 0), (0, pp - p), (0, ga - g)),
    ).reshape(g * pp, ga)
    ab = jnp.pad(attn_b, (0, ga - g)).reshape(1, ga)
    wc = jnp.pad(
        cluster_w.astype(wdt).reshape(g, p, g, k),
        ((0, 0), (0, pp - p), (0, 0), (0, kp - k)),
    ).reshape(g * pp, g * kp)
    ce = jnp.pad(centers, ((0, kp - k), (0, pp - p)))
    return we, wa, ab, wc, wc.T, wa.T, ce


@functools.partial(
    jax.jit,
    static_argnames=("groups", "deq_scale", "deq_bias", "interpret",
                     "dtype"),
)
def _run_bwd(
    frames, num_frames, expand_w, attn_w, attn_b, cluster_w, centers,
    dy, groups, deq_scale, deq_bias, interpret, dtype,
):
    b, f, d = frames.shape
    g = groups
    de = expand_w.shape[1]
    p = de // g
    k = cluster_w.shape[1] // g
    pp = _round_up(p, 128)
    kp = _round_up(k, 128)
    ga = _round_up(g, 128)
    f_pad = _round_up(f, 8)
    if f_pad != f:
        frames = jnp.pad(frames, ((0, 0), (0, f_pad - f), (0, 0)))
    is_u8 = frames.dtype == jnp.uint8
    wdt = jnp.dtype(dtype)

    we, wa, ab, wc, wct, wat, ce = _pad_weights(
        expand_w, attn_w, attn_b, cluster_w, centers,
        g, p, k, pp, kp, ga, wdt,
    )
    dy_p = jnp.pad(
        dy.astype(jnp.float32), ((0, 0), (0, kp - k), (0, pp - p))
    )

    const = lambda i, nf: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f_pad, d), lambda i, nf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, pp), lambda i, nf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g * pp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((g * pp, ga), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ga), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((g * pp, g * kp), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * kp, g * pp), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ga, g * pp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, pp), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, g * pp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((g * pp, ga), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ga), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((g * pp, g * kp), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, pp), const, memory_space=pltpu.VMEM),
        ),
    )
    flops_fwd = (
        2 * b * f_pad * d * g * pp
        + 2 * b * f_pad * g * pp * (ga + g * kp)
        + 2 * b * f_pad * g * kp * pp
    )
    dwe_p, dwa_p, dab_p, dwc_p, dce_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            g=g, k=k, kp=kp, pp=pp,
            deq_scale=float(deq_scale), deq_bias=float(deq_bias),
            is_u8=is_u8, dtype=jnp.dtype(dtype),
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((d, g * pp), jnp.float32),
            jax.ShapeDtypeStruct((g * pp, ga), jnp.float32),
            jax.ShapeDtypeStruct((1, ga), jnp.float32),
            jax.ShapeDtypeStruct((g * pp, g * kp), jnp.float32),
            jax.ShapeDtypeStruct((kp, pp), jnp.float32),
        ),
        # Resident: ~21 MB weights (bf16 + transposed copies) + ~29 MB
        # f32 accumulators + ~12 MB per-video activations at the
        # reference config. v5e physical VMEM is 128 MB; the default
        # 16 MB budget (and the serving kernel's 32 MB) are policy
        # caps, not the hardware limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_fwd,
            bytes_accessed=b * f_pad * d * (1 if is_u8 else 4)
            + b * kp * pp * 4
            + 2 * (d * g * pp + g * pp * (ga + g * kp)) * 2
            + (d * g * pp + g * pp * (ga + g * kp) + kp * pp) * 4,
            transcendentals=4 * b * f_pad * g * kp,
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32), frames, dy_p,
        we, wa, ab, wc, wct, wat, ce,
    )

    # un-pad back to the original param shapes (pads are exact zeros:
    # padded-P rows see xe==0, padded-K columns see d_act==0)
    de_ = g * p
    dwe = dwe_p.reshape(d, g, pp)[:, :, :p].reshape(d, de_)
    dwa = dwa_p.reshape(g, pp, ga)[:, :p, :g].reshape(de_, g)
    dab = dab_p[0, :g]
    dwc = dwc_p.reshape(g, pp, g, kp)[:, :p, :, :k].reshape(de_, g * k)
    dce = dce_p[:k, :p]
    return dwe, dwa, dab, dwc, dce


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def nextvlad_aggregate_train(
    frames, num_frames, expand_w, attn_w, attn_b, cluster_w, centers,
    groups: int,
    deq_scale: float = DEQUANT_SCALE,
    deq_bias: float = DEQUANT_BIAS,
    interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """Differentiable fused NeXtVLAD aggregation.

    Same signature/semantics as kernels/nextvlad.py::nextvlad_aggregate
    (returns the intra-normalised [B, K, P] f32 descriptors, pre-BN) but
    with a custom VJP producing gradients for the five weights. frames
    and num_frames are reader data: their cotangents are zero.
    """
    return nextvlad_aggregate(
        frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
        centers, groups=groups, deq_scale=deq_scale, deq_bias=deq_bias,
        interpret=interpret, dtype=dtype,
    )


def _fwd_rule(frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
              centers, groups, deq_scale, deq_bias, interpret, dtype):
    y = nextvlad_aggregate(
        frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
        centers, groups=groups, deq_scale=deq_scale, deq_bias=deq_bias,
        interpret=interpret, dtype=dtype,
    )
    # zero-residual beyond the primal inputs: the backward recomputes
    # everything per video in VMEM
    res = (frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
           centers)
    return y, res


def _bwd_rule(groups, deq_scale, deq_bias, interpret, dtype, res, dy):
    (frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
     centers) = res
    dwe, dwa, dab, dwc, dce = _run_bwd(
        frames, num_frames, expand_w, attn_w, attn_b, cluster_w,
        centers, dy, groups, deq_scale, deq_bias, interpret, dtype,
    )
    # CONTRACT: frames/num_frames get None (zero) cotangents — the
    # model feeds raw reader features, which are never differentiated.
    # A caller that needs d(frames) (saliency, input-side distillation)
    # must use the XLA path (nextvlad_train_fused=False); this kernel
    # would silently return zeros, not raise.
    return None, None, dwe, dwa, dab, dwc, dce


nextvlad_aggregate_train.defvjp(_fwd_rule, _bwd_rule)
