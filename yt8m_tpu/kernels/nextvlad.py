"""Fused NeXtVLAD aggregation Pallas kernel.

Reference lineage: models/nextvlad.py (arXiv:1811.05014). The jnp
serving path materialises three large intermediates in HBM per batch —
xe [B, F, lambda*D] (~1.4 GB f32 at B=512), the [B, F, G, K] cluster
logits and the same-shaped assignment — and measures ~4x its matmul
roofline (35 ms at B=512; BENCH_NOTES). One program per video fuses the
whole aggregation in VMEM:

    x      = u8 * deq_scale + deq_bias            (on-the-fly dequantize)
    xe     = x @ We                               (lambda-expansion)
    alpha  = sigmoid(xe @ Wa + b)                 (group attention)
    act    = xe @ Wc -> per-group softmax_K       (soft assignment)
    assign = softmax * alpha * (t < num_frames)
    vlad   = sum_{f,g} assign (x) xg - colsum(assign) (x) centers
    vlad   = intra_norm_P(vlad)                   (gradient-safe l2)

Layout trick: the expanded dim De = G*P has P = lambda*D/G (288 at the
reference config) which is NOT lane-aligned, so all weights are
re-laid-out OUTSIDE the kernel into a group-major, lane-padded form
(P -> Pp = round_up(P, 128), K -> Kp): xe comes out of the expansion
matmul already as [F, G*Pp] with every group's slice 128-aligned, and
the zero-padded weight rows/columns make the pads exact zeros end to
end (padded cluster logits are masked to -1e30 before the softmax).
The per-group loop is unrolled (G=8): each iteration is one aligned
lane-slice softmax plus one [K, F] x [F, Pp] MXU matmul accumulated in
f32.

Serving-only (training BN needs cross-batch stats, so training keeps
the jnp graph). Equivalence vs the jnp oracle is tested in interpret
mode (tests/test_nextvlad_kernel.py) and on-chip
(scripts/validate_kernels_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yt8m_tpu.data.quantize import DEQUANT_BIAS, DEQUANT_SCALE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    nf_ref,        # scalar prefetch: [B] int32 num_frames
    frames_ref,    # [1, Fp, D] (u8 or f32)
    we_ref,        # [D, G*Pp]   (group-major padded expansion)
    wa_ref,        # [G*Pp, Ga]  (attention, lane-padded groups)
    ab_ref,        # [1, Ga]
    wc_ref,        # [G*Pp, G*Kp]
    centers_ref,   # [Kp, Pp]
    out_ref,       # [1, Kp, Pp]
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
    if is_u8:
        # Mosaic has no direct u8->f32 cast; hop through int32.
        x = frames_ref[0].astype(jnp.int32).astype(jnp.float32)
        x = x * deq_scale + deq_bias
    else:
        x = frames_ref[0].astype(jnp.float32)

    # lambda-expansion (f32 accumulate, then the single bf16 cast every
    # downstream consumer shares — identical to the jnp path's
    # xe(f32).astype(dtype) at each use site).
    xe = jnp.dot(
        x.astype(dtype),
        we_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)                                     # [Fp, G*Pp]

    alpha = jax.nn.sigmoid(
        jnp.dot(
            xe, wa_ref[...].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + ab_ref[...]
    )                                                    # [Fp, Ga]
    act = jnp.dot(
        xe, wc_ref[...].astype(dtype),
        preferred_element_type=jnp.float32,
    )                                                    # [Fp, G*Kp]

    nf = nf_ref[i]
    rowmask = (
        jax.lax.broadcasted_iota(jnp.int32, (fp, kp), 0) < nf
    )
    # Padded cluster columns carry zero logits that must not join the
    # softmax.
    colvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (fp, kp), 1) < k
    )

    vlad = jnp.zeros((kp, pp), jnp.float32)
    a_sum = jnp.zeros((1, kp), jnp.float32)
    for gi in range(g):
        act_g = act[:, gi * kp:(gi + 1) * kp]            # [Fp, Kp]
        act_g = jnp.where(colvalid, act_g, -1e30)
        m = jnp.max(act_g, axis=-1, keepdims=True)
        e = jnp.exp(act_g - m)
        sm = e / jnp.sum(e, axis=-1, keepdims=True)
        ag = alpha[:, gi:gi + 1]                          # [Fp, 1]
        assign_g = jnp.where(rowmask, sm * ag, 0.0)       # [Fp, Kp] f32
        a_sum = a_sum + jnp.sum(assign_g, axis=0, keepdims=True)
        xg_g = xe[:, gi * pp:(gi + 1) * pp]               # [Fp, Pp]
        vlad = vlad + jax.lax.dot_general(
            assign_g.astype(dtype),
            xg_g,
            dimension_numbers=(((0,), (0,)), ((), ())),   # [Kp, Pp]
            preferred_element_type=jnp.float32,
        )

    vlad = vlad - a_sum.T * centers_ref[...]
    # gradient-safe intra-normalisation over P (pads are exact zeros,
    # so the norm over Pp equals the norm over P)
    sum_sq = jnp.sum(vlad * vlad, axis=1, keepdims=True)
    out_ref[0] = vlad / jnp.sqrt(jnp.maximum(sum_sq, 1e-12))


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups", "deq_scale", "deq_bias", "interpret", "dtype"
    ),
)
def nextvlad_aggregate(
    frames,      # [B, F, D] uint8 or float32
    num_frames,  # [B] int32
    expand_w,    # [D, De] f32, De = lambda * D
    attn_w,      # [De, G] f32
    attn_b,      # [G] f32
    cluster_w,   # [De, G*K] f32
    centers,     # [K, P] f32, P = De // G
    groups: int,
    deq_scale: float = DEQUANT_SCALE,
    deq_bias: float = DEQUANT_BIAS,
    interpret: bool = False,
    dtype=jnp.bfloat16,  # matmul compute dtype (pass the model's hp.dtype)
):
    """Intra-normalised NeXtVLAD descriptors [B, K, P] float32 (pre-BN).

    All weight re-layouts below are pure XLA pads/reshapes of the f32
    params (a few MB once per jit trace); zero pads guarantee the padded
    lanes stay exact zeros through the kernel.
    """
    b, f, d = frames.shape
    g = groups
    de = expand_w.shape[1]
    if de % g:
        raise ValueError(f"expansion dim {de} not divisible by groups {g}")
    p = de // g
    k = cluster_w.shape[1] // g
    pp = _round_up(p, 128)
    kp = _round_up(k, 128)
    ga = _round_up(g, 128)
    f_pad = _round_up(f, 8)
    if f_pad != f:
        frames = jnp.pad(frames, ((0, 0), (0, f_pad - f), (0, 0)))
    is_u8 = frames.dtype == jnp.uint8

    # Group-major lane-padded layouts (see module docstring), pre-cast
    # to the matmul dtype OUTSIDE the kernel (same trick as
    # kernels/moe_head.py: halves the resident VMEM weight footprint —
    # ~14 MB bf16 vs ~28 MB f32 at the reference config — and the
    # in-kernel .astype becomes a no-op; the jnp path casts the f32
    # params at each use, so values are identical).
    wdt = jnp.dtype(dtype)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad, d), lambda i, nf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, g * pp), lambda i, nf: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g * pp, ga), lambda i, nf: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ga), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (g * pp, g * kp), lambda i, nf: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kp, pp), lambda i, nf: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp, pp), lambda i, nf: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            g=g,
            k=k,
            kp=kp,
            pp=pp,
            deq_scale=float(deq_scale),
            deq_bias=float(deq_bias),
            is_u8=is_u8,
            dtype=jnp.dtype(dtype),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kp, pp), jnp.float32),
        # Resident weights (~14 MB bf16 at the reference config) + the
        # per-video xe/act blocks overflow the 16 MB default budget;
        # measured fit at the reference shapes is ~22 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_pad * d * g * pp          # expansion
            + 2 * b * f_pad * g * pp * (ga + g * kp)  # attention+clusters
            + 2 * b * f_pad * g * kp * pp,            # aggregation
            bytes_accessed=b * f_pad * d * (1 if is_u8 else 4)
            + (d * g * pp + g * pp * (ga + g * kp)) * 2
            + b * kp * pp * 4,
            transcendentals=2 * b * f_pad * g * kp,
        ),
        interpret=interpret,
    )(
        num_frames.astype(jnp.int32), frames, we, wa, ab, wc, ce
    )
    return out[:, :k, :p]


def nextvlad_aggregate_reference(
    frames, num_frames, expand_w, attn_w, attn_b, cluster_w, centers,
    groups: int,
    deq_scale: float = DEQUANT_SCALE,
    deq_bias: float = DEQUANT_BIAS,
    dtype=jnp.bfloat16,
    normalize: bool = True,
):
    """jnp oracle with the model's exact serving math
    (models/nextvlad.py lines 58-116: bf16 matmuls, f32 softmax,
    gradient-safe intra-norm). normalize=False returns the PRE-norm
    descriptors — the equivalence tests use the row magnitudes to
    decide which rows may legitimately differ in direction (bf16
    reduction-order noise amplified by normalising a tiny row)."""
    b, f, d = frames.shape
    g = groups
    de = expand_w.shape[1]
    p = de // g
    k = cluster_w.shape[1] // g
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x * deq_scale + deq_bias
    xe = jnp.einsum(
        "bfd,de->bfe", x.astype(dtype), expand_w.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    alpha = jax.nn.sigmoid(
        jnp.einsum(
            "bfe,eg->bfg", xe.astype(dtype), attn_w.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + attn_b
    )
    act = jnp.einsum(
        "bfe,ec->bfc", xe.astype(dtype), cluster_w.astype(dtype),
        preferred_element_type=jnp.float32,
    ).reshape(b, f, g, k)
    assign = jax.nn.softmax(act, axis=-1)
    assign = assign * alpha[:, :, :, None]
    mask = (
        jnp.arange(f)[None, :] < num_frames.astype(jnp.int32)[:, None]
    )
    assign = jnp.where(mask[:, :, None, None], assign, 0.0)
    xg = xe.reshape(b, f, g, p)
    vlad = jnp.einsum(
        "bfgk,bfgp->bkp", assign.astype(dtype), xg.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    a_sum = jnp.sum(assign, axis=(1, 2))
    vlad = vlad - a_sum[:, :, None] * centers[None, :, :]
    if not normalize:
        return vlad
    sum_sq = jnp.sum(jnp.square(vlad), axis=2, keepdims=True)
    return vlad / jnp.sqrt(jnp.maximum(sum_sq, 1e-12))
