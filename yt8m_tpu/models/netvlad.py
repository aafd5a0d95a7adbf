"""NetVLAD / gated NetVLAD aggregation models.

Reference: fork `all_frame_models/netvlad_model.py`-like (SURVEY.md §2.2);
algorithm per the WILLOW + Monkeytyping papers:

  assign = softmax(frames @ W_c [+BN])          [B, F, K]
  assign = assign * frame_mask                  (padding contributes zero)
  vlad   = assign^T @ frames - (sum_f assign) * centers   [B, K, D]
  intra-normalise over D, flatten, L2-normalise  [B, K*D]
  FC -> hidden (+BN), optional context gating, then the MoE head.

TPU notes: both heavy ops are batched matmuls ([B,F,D]x[D,K] and
[B,K,F]x[B,F,D]) — MXU-dense with static shapes; the Pallas fusion of
assign+residual lives in yt8m_tpu.kernels.netvlad (used when enabled).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    sample_random_frames,
)
from yt8m_tpu.models.heads import ContextGate, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


class _NetVladAggregation(nn.Module):
    cluster_size: int
    add_batch_norm: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, frames, mask, train: bool = False):
        """frames [B, F, D], mask [B, F] -> (vlad [B, K*D], reg_loss)."""
        b, f, d = frames.shape
        k = self.cluster_size
        cluster_weights = self.param(
            "cluster_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, k),
            jnp.float32,
        )
        act = jnp.dot(
            frames.reshape(b * f, d).astype(self.dtype),
            cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            act = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="cluster_bn",
            )(act)
        else:
            bias = self.param(
                "cluster_biases",
                nn.initializers.normal(1.0 / jnp.sqrt(d)),
                (k,),
                jnp.float32,
            )
            act = act + bias
        assign = nn.softmax(act, axis=-1).reshape(b, f, k)
        assign = assign * mask[:, :, None]

        cluster_weights2 = self.param(
            "cluster_weights2",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (1, d, k),
            jnp.float32,
        )
        a_sum = jnp.sum(assign, axis=1, keepdims=True)  # [B, 1, K]
        a = a_sum * cluster_weights2  # [B, D, K]

        # assign^T @ frames: [B, K, F] x [B, F, D] -> [B, K, D]
        vlad = jnp.einsum(
            "bfk,bfd->bkd",
            assign.astype(self.dtype),
            frames.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        vlad = vlad - jnp.transpose(a, (0, 2, 1))  # [B, K, D]

        # intra-normalisation over the feature dim, then global L2.
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=2, keepdims=True), 1e-6
        )
        vlad = vlad.reshape(b, k * d)
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-6
        )
        return vlad, l2_loss(cluster_weights)


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
            mask = jnp.ones((b, f), jnp.float32)
        else:
            mask = frame_mask(num_frames, f, jnp.float32)
        features = ensure_float(features)

        vlad, reg = _NetVladAggregation(
            cluster_size=hp.netvlad_cluster_size,
            add_batch_norm=hp.netvlad_add_batch_norm,
            dtype=hp.dtype,
            name="vlad",
        )(features, mask, train=train)

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
            hidden = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="hidden1_bn",
            )(hidden)
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
                name="context_gate",
            )(hidden, train=train)

        out = make_classifier_head(hp)(hidden)
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
