"""Frame-level models: mask-aware pooling and DBoF.

Reference: frame_level_models.py :: FrameLevelLogisticModel, DbofModel.
Input: dequantized features [B, F, D] plus num_frames [B].
"""

from __future__ import annotations

import flax.linen as nn
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
        rng = self.make_rng("sample")
        if hp.sample_random_frames:
            x = sample_random_frames(rng, features, num_frames, hp.iterations)
        else:
            x = sample_random_sequence(
                rng, features, num_frames, hp.iterations
            )
        # Dequantize AFTER sampling: only S of 300 frames pay the cast.
        x = ensure_float(x)
        b, s, d = x.shape
        x = x.reshape(b * s, d)

        if hp.dbof_add_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="input_bn",
            )(x)

        cluster_kernel = self.param(
            "cluster_kernel",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, hp.dbof_cluster_size),
            jnp.float32,
        )
        act = jnp.dot(
            x.astype(hp.dtype),
            cluster_kernel.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        if hp.dbof_add_batch_norm:
            act = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="cluster_bn",
            )(act)
        else:
            bias = self.param(
                "cluster_bias",
                nn.initializers.normal(0.01),
                (hp.dbof_cluster_size,),
                jnp.float32,
            )
            act = act + bias
        act = nn.relu(act)

        act = act.reshape(b, s, hp.dbof_cluster_size)
        method = self.pooling_override or hp.dbof_pooling_method
        if method == "soft":
            # SoftDBoF (WILLOW-era variant): sum of per-frame activations
            # normalised by a softmax over the cluster axis.
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
            hidden = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="hidden_bn",
            )(hidden)
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
                name="context_gate",
            )(hidden, train=train)

        out = make_classifier_head(hp)(hidden)
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
