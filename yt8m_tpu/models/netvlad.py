"""NetVLAD / gated NetVLAD aggregation models.

Reference: fork `all_frame_models/netvlad_model.py`-like (SURVEY.md §2.2);
algorithm per the WILLOW + Monkeytyping papers:

  assign = softmax(frames @ W_c [+BN])          [B, F, K]
  assign = assign * frame_mask                  (padding contributes zero)
  vlad   = assign^T @ frames - (sum_f assign) * centers   [B, K, D]
  intra-normalise over D, flatten, L2 normalise  [B, K*D]
  FC -> hidden (+BN), optional context gating, then the MoE head.

TPU notes: training computes the assignment matmul + BatchNorm in XLA
(cross-batch stats), then runs the FUSED custom-VJP core
(kernels/netvlad_train.py): masked softmax + both aggregation matmuls
in one VMEM pass, assignment rematerialised in the backward. Inference
folds the BN into a per-cluster affine and runs the fully fused kernel
(kernels/netvlad.py): dequantize, assignment matmul, masked softmax,
residual matmul, and both normalisations in one VMEM-resident pass per
video.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from yt8m_tpu.kernels.netvlad import netvlad_aggregate
from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    l2_normalize,
    sample_random_frames,
)
from yt8m_tpu.models.heads import ContextGate, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


class _NetVladAggregation(nn.Module):
    """frames (+num_frames) -> L2-normalised VLAD [B, K*D].

    BatchNorm on the assignment logits is implemented inline (not
    nn.BatchNorm) so inference can fold it into the Pallas kernel's
    per-cluster affine.
    """

    cluster_size: int
    add_batch_norm: bool = True
    dtype: object = jnp.float32
    use_pallas: bool = True
    fused_train: bool = False  # match hparams.netvlad_fused_train default
    bn_axis: str = ""  # cross-replica BN axis (models/norm.py)

    @nn.compact
    def __call__(self, frames, num_frames, mask, train: bool = False):
        b, f, d = frames.shape
        k = self.cluster_size
        cluster_weights = self.param(
            "cluster_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, k),
            jnp.float32,
        )
        cluster_weights2 = self.param(
            "cluster_weights2",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (1, d, k),
            jnp.float32,
        )
        if self.add_batch_norm:
            gamma = self.param(
                "cluster_bn_scale", nn.initializers.ones, (k,), jnp.float32
            )
            beta = self.param(
                "cluster_bn_bias", nn.initializers.zeros, (k,), jnp.float32
            )
            ra_mean = self.variable(
                "batch_stats", "cluster_bn_mean",
                lambda: jnp.zeros((k,), jnp.float32),
            )
            ra_var = self.variable(
                "batch_stats", "cluster_bn_var",
                lambda: jnp.ones((k,), jnp.float32),
            )
        else:
            cluster_biases = self.param(
                "cluster_biases",
                nn.initializers.normal(1.0 / jnp.sqrt(d)),
                (k,),
                jnp.float32,
            )

        reg = l2_loss(cluster_weights)
        centers_kd = jnp.transpose(cluster_weights2[0])  # [K, D]

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
            static_shape,
        )

        if (
            not train
            and self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and jax.default_backend() == "tpu"
            # Symbolic dims (polymorphic-batch export) can't trace the
            # kernel's block arithmetic — fall back to the XLA graph.
            and static_shape(frames)
        ):
            # Inference: fold (BN | bias) into a per-cluster affine and run
            # the fused kernel on the RAW (possibly uint8) frames.
            if self.add_batch_norm:
                inv = gamma * jax.lax.rsqrt(ra_var.value + _BN_EPS)
                act_scale = inv
                act_bias = beta - ra_mean.value * inv
            else:
                act_scale = jnp.ones((k,), jnp.float32)
                act_bias = cluster_biases
            vlad = netvlad_aggregate(
                frames, num_frames, cluster_weights, act_scale, act_bias,
                centers_kd, dtype=self.dtype,
            )
            return vlad.reshape(b, k * d), reg

        x = ensure_float(frames)
        act = jnp.dot(
            x.reshape(b * f, d).astype(self.dtype),
            cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            if train:
                from yt8m_tpu.models.norm import bn_moments

                mean, var = bn_moments(act, self.bn_axis)
                if not self.is_initializing():
                    ra_mean.value = (
                        _BN_MOMENTUM * ra_mean.value
                        + (1 - _BN_MOMENTUM) * mean
                    )
                    ra_var.value = (
                        _BN_MOMENTUM * ra_var.value
                        + (1 - _BN_MOMENTUM) * var
                    )
            else:
                mean, var = ra_mean.value, ra_var.value
            act = (act - mean) * jax.lax.rsqrt(var + _BN_EPS)
            act = act * gamma + beta
        else:
            act = act + cluster_biases
        interpret = pallas_interpret_forced()
        if (
            self.use_pallas
            and self.fused_train
            and kernels_enabled()
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or interpret)
            and static_shape(frames)
        ):
            # Fused TRAINING core (kernels/netvlad_train.py, custom VJP):
            # masked softmax + both aggregation matmuls in one
            # VMEM-resident pass per video; the [B,F,K] assignment is
            # rematerialised in the backward and never stored in HBM.
            from yt8m_tpu.kernels.netvlad_train import netvlad_core

            num_frames_eff = jnp.sum(mask, axis=1).astype(jnp.int32)
            vlad = netvlad_core(
                act.reshape(b, f, k),
                x,
                num_frames_eff,
                centers_kd,
                interpret,
            )
        else:
            assign = nn.softmax(act, axis=-1).reshape(b, f, k)
            assign = assign * mask[:, :, None]

            a_sum = jnp.sum(assign, axis=1)  # [B, K]
            vlad = jnp.einsum(
                "bfk,bfd->bkd",
                assign.astype(self.dtype),
                x.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            vlad = vlad - a_sum[:, :, None] * centers_kd[None, :, :]

        vlad = l2_normalize(vlad, axis=2)
        vlad = vlad.reshape(b, k * d)
        vlad = l2_normalize(vlad, axis=1)
        return vlad, reg


class _NetVladBase(nn.Module):
    hp: ModelHParams
    gating: bool = False

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        b, f, d = features.shape
        if hp.netvlad_sample_frames > 0:
            rng = self.make_rng("sample")
            features = sample_random_frames(
                rng, features, num_frames, hp.netvlad_sample_frames
            )
            f = hp.netvlad_sample_frames
            num_frames = jnp.full((b,), f, jnp.int32)
            mask = jnp.ones((b, f), jnp.float32)
        else:
            mask = frame_mask(num_frames, f, jnp.float32)

        vlad, reg = _NetVladAggregation(
            cluster_size=hp.netvlad_cluster_size,
            add_batch_norm=hp.netvlad_add_batch_norm,
            dtype=hp.dtype,
            use_pallas=hp.netvlad_use_pallas,
            fused_train=hp.netvlad_fused_train,
            bn_axis=hp.bn_axis,
            name="vlad",
        )(features, num_frames, mask, train=train)

        hidden_weights = self.param(
            "hidden1_weights",
            nn.initializers.normal(
                1.0 / jnp.sqrt(hp.netvlad_cluster_size)
            ),
            (vlad.shape[-1], hp.netvlad_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            vlad.astype(hp.dtype),
            hidden_weights.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        if hp.netvlad_add_batch_norm:
            from yt8m_tpu.models.norm import batch_norm

            hidden = batch_norm(train, "hidden1_bn", hp.bn_axis)(hidden)
        else:
            hbias = self.param(
                "hidden1_biases",
                nn.initializers.normal(0.01),
                (hp.netvlad_hidden_size,),
                jnp.float32,
            )
            hidden = hidden + hbias
        hidden = nn.relu(hidden)

        if self.gating:
            hidden = ContextGate(
                add_batch_norm=hp.netvlad_add_batch_norm,
                dtype=hp.dtype,
                bn_axis=hp.bn_axis,
                name="context_gate",
            )(hidden, train=train)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * (reg + l2_loss(hidden_weights))
        return out


@register("NetVladModel", frame_level=True)
class NetVladModel(_NetVladBase):
    gating: bool = False


@register("GatedNetVladModel", frame_level=True)
class GatedNetVladModel(_NetVladBase):
    gating: bool = True
