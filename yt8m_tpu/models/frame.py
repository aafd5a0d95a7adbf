"""Frame-level models: mask-aware pooling and DBoF.

Reference: frame_level_models.py :: FrameLevelLogisticModel, DbofModel.
Input: dequantized features [B, F, D] plus num_frames [B].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    frame_pooling,
    sample_random_frames,
    sample_random_sequence,
)
from yt8m_tpu.models.heads import l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


@register("FrameLevelLogisticModel", frame_level=True)
class FrameLevelLogisticModel(nn.Module):
    """Mask-weighted mean over frames -> logistic head.

    Reference: frame_level_models.py :: FrameLevelLogisticModel — frame mean
    weighted by the validity mask, then one sigmoid FC.
    """

    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        features = ensure_float(features)
        mask = frame_mask(num_frames, features.shape[1], features.dtype)
        pooled = frame_pooling(features, "average", mask)
        from yt8m_tpu.models.heads import LogisticHead

        return LogisticHead(
            vocab_size=self.hp.vocab_size,
            l2_penalty=self.hp.l2_penalty,
            dtype=self.hp.dtype,
            name="tower",
        )(pooled)


_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


def _inline_bn(
    x, gamma, beta, ra_mean, ra_var, update_stats: bool,
    axis_name: str = "",
):
    """BatchNorm over axis 0 with foldable running stats (mirrors
    nn.BatchNorm semantics: momentum 0.99, eps 1e-3). axis_name makes
    the batch statistics cross-replica inside a shard_map body
    (models/norm.py :: bn_moments)."""
    if update_stats:
        from yt8m_tpu.models.norm import bn_moments

        mean, var = bn_moments(x, axis_name)
        ra_mean.value = (
            _BN_MOMENTUM * ra_mean.value + (1 - _BN_MOMENTUM) * mean
        )
        ra_var.value = (
            _BN_MOMENTUM * ra_var.value + (1 - _BN_MOMENTUM) * var
        )
    else:
        mean, var = ra_mean.value, ra_var.value
    return (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * gamma + beta


class _DbofBase(nn.Module):
    """Deep Bag-of-Frames.

    Reference: frame_level_models.py :: DbofModel.create_model —
      1. sample `--iterations` frames (SampleRandomFrames when
         --sample_random_frames else SampleRandomSequence);
      2. FC frames -> --dbof_cluster_size (+BN or bias, ReLU);
      3. max/average pool over sampled frames (--dbof_pooling_method);
      4. FC -> --dbof_hidden_size (+BN, ReLU);
      5. video-level classifier (--dbof_video_level_classifier_model).

    TPU: steps 2/4 are [B*S, D] matmuls — MXU dense; sampling keeps the
    per-video work fixed regardless of true frame count (static shapes).
    """

    hp: ModelHParams
    pooling_override: str = ""  # "" = hp.dbof_pooling_method
    gated: bool = False

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        k = hp.dbof_cluster_size
        rng = self.make_rng("sample")
        if hp.sample_random_frames:
            x_raw = sample_random_frames(
                rng, features, num_frames, hp.iterations
            )
        else:
            x_raw = sample_random_sequence(
                rng, features, num_frames, hp.iterations
            )
        b, s, d = x_raw.shape

        cluster_kernel = self.param(
            "cluster_kernel",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, k),
            jnp.float32,
        )
        # Input/cluster BatchNorms are inline (not nn.BatchNorm) so
        # inference can fold them into per-dim affines for the fused
        # cluster+pool kernel — same pattern as models/netvlad.py.
        if hp.dbof_add_batch_norm:
            in_gamma = self.param(
                "input_bn_scale", nn.initializers.ones, (d,), jnp.float32
            )
            in_beta = self.param(
                "input_bn_bias", nn.initializers.zeros, (d,), jnp.float32
            )
            in_mean = self.variable(
                "batch_stats", "input_bn_mean",
                lambda: jnp.zeros((d,), jnp.float32),
            )
            in_var = self.variable(
                "batch_stats", "input_bn_var",
                lambda: jnp.ones((d,), jnp.float32),
            )
            c_gamma = self.param(
                "cluster_bn_scale", nn.initializers.ones, (k,), jnp.float32
            )
            c_beta = self.param(
                "cluster_bn_bias", nn.initializers.zeros, (k,), jnp.float32
            )
            c_mean = self.variable(
                "batch_stats", "cluster_bn_mean",
                lambda: jnp.zeros((k,), jnp.float32),
            )
            c_var = self.variable(
                "batch_stats", "cluster_bn_var",
                lambda: jnp.ones((k,), jnp.float32),
            )
        else:
            cluster_bias = self.param(
                "cluster_bias",
                nn.initializers.normal(0.01),
                (k,),
                jnp.float32,
            )

        method = self.pooling_override or hp.dbof_pooling_method

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
            static_shape,
        )

        interpret = pallas_interpret_forced()
        use_fused = (
            not train
            and method == "max"
            and hp.dbof_use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or interpret)
            # Symbolic dims (polymorphic-batch export) can't trace the
            # kernel's block arithmetic — fall back to the XLA graph.
            and static_shape(x_raw)
        )
        if use_fused:
            # Fused cluster+pool (kernels/dbof.py): dequant + input-BN
            # affine + cluster matmul + BN/ReLU + max-pool per K-tile,
            # never materialising act [B*S, K] in HBM.
            from yt8m_tpu.data.quantize import DEQUANT_BIAS, DEQUANT_SCALE
            from yt8m_tpu.kernels.dbof import dbof_cluster_maxpool_v2

            if hp.dbof_add_batch_norm:
                s_in = in_gamma * jax.lax.rsqrt(in_var.value + 1e-3)
                b_in = in_beta - in_mean.value * s_in
                s_act = c_gamma * jax.lax.rsqrt(c_var.value + 1e-3)
                b_act = c_beta - c_mean.value * s_act
            else:
                s_in = jnp.ones((d,), jnp.float32)
                b_in = jnp.zeros((d,), jnp.float32)
                s_act = jnp.ones((k,), jnp.float32)
                b_act = cluster_bias
            if x_raw.dtype == jnp.uint8:
                # fold dequantize into the input affine
                b_in = DEQUANT_BIAS * s_in + b_in
                s_in = DEQUANT_SCALE * s_in
            if hp.dbof_int8_serving and x_raw.dtype == jnp.uint8:
                from yt8m_tpu.kernels.dbof import (
                    dbof_cluster_maxpool_int8,
                )

                pooled = dbof_cluster_maxpool_int8(
                    x_raw, cluster_kernel, s_in, b_in, s_act, b_act,
                    interpret=interpret,
                )
            else:
                pooled = dbof_cluster_maxpool_v2(
                    x_raw, cluster_kernel, s_in, b_in, s_act, b_act,
                    interpret=interpret, dtype=hp.dtype,
                )
        else:
            # Dequantize AFTER sampling: only S of 300 frames pay the
            # cast.
            x = ensure_float(x_raw).reshape(b * s, d)
            if hp.dbof_add_batch_norm:
                x = _inline_bn(
                    x, in_gamma, in_beta, in_mean, in_var,
                    train and not self.is_initializing(),
                    axis_name=hp.bn_axis,
                )
            act = jnp.dot(
                x.astype(hp.dtype),
                cluster_kernel.astype(hp.dtype),
                preferred_element_type=jnp.float32,
            )
            if hp.dbof_add_batch_norm:
                act = _inline_bn(
                    act, c_gamma, c_beta, c_mean, c_var,
                    train and not self.is_initializing(),
                    axis_name=hp.bn_axis,
                )
            else:
                act = act + cluster_bias
            act = nn.relu(act)

            act = act.reshape(b, s, k)
            if method == "soft":
                # SoftDBoF (WILLOW-era variant): sum of per-frame
                # activations normalised by a softmax over clusters.
                soft = nn.softmax(act, axis=-1)
                pooled = jnp.sum(soft, axis=1)
            else:
                pooled = frame_pooling(act, method)

        hidden_kernel = self.param(
            "hidden_kernel",
            nn.initializers.normal(1.0 / jnp.sqrt(hp.dbof_cluster_size)),
            (hp.dbof_cluster_size, hp.dbof_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            pooled.astype(hp.dtype),
            hidden_kernel.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        if hp.dbof_add_batch_norm:
            from yt8m_tpu.models.norm import batch_norm

            hidden = batch_norm(train, "hidden_bn", hp.bn_axis)(hidden)
        else:
            hbias = self.param(
                "hidden_bias",
                nn.initializers.normal(0.01),
                (hp.dbof_hidden_size,),
                jnp.float32,
            )
            hidden = hidden + hbias
        hidden = nn.relu(hidden)

        if self.gated:
            from yt8m_tpu.models.heads import ContextGate

            hidden = ContextGate(
                add_batch_norm=hp.dbof_add_batch_norm,
                dtype=hp.dtype,
                bn_axis=hp.bn_axis,
                name="context_gate",
            )(hidden, train=train)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * l2_loss(cluster_kernel, hidden_kernel)
        return out


@register("DbofModel", frame_level=True)
class DbofModel(_DbofBase):
    pooling_override: str = ""
    gated: bool = False


@register("GatedDbofModel", frame_level=True)
class GatedDbofModel(_DbofBase):
    """DBoF with a context gate on the hidden representation
    (WILLOW/monkeytyping-era gated-DBoF variant)."""

    gated: bool = True


@register("SoftDbofModel", frame_level=True)
class SoftDbofModel(_DbofBase):
    """DBoF with softmax-normalised (soft-count) pooling."""

    pooling_override: str = "soft"
