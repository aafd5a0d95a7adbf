"""NeXtVLAD aggregation model.

Reference lineage: PAPERS.md — "NeXtVLAD: An Efficient Neural Network to
Aggregate Frame-level Features for Large-scale Video Classification"
(arXiv:1811.05014), the successor to the fork's NetVLAD family.

Algorithm (masked for padded frames):
  x'      = x W_e                       [B, F, lambda*D]  (expansion)
  alpha   = sigmoid(x' W_a + b)         [B, F, G]         (group attention)
  assign  = softmax_K(x' W_c)           [B, F, G, K]
  assign  = assign * alpha * frame_mask
  x''     = reshape(x', [B, F, G, lambda*D/G])
  vlad    = sum_{f,g} assign * (x'' - centers)   [B, K, lambda*D/G]
  intra-norm over the group dim, flatten, BN -> hidden FC -> head.

TPU notes: everything is batched matmuls + elementwise; the grouped
residual sum is one einsum ([B,F,G,K] x [B,F,G,P] -> [B,K,P]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    l2_normalize,
)
from yt8m_tpu.models.heads import ContextGate, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


@register("NeXtVladModel", frame_level=True)
class NeXtVladModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        features = ensure_float(features)
        b, f, d = features.shape
        lam = hp.nextvlad_expansion
        g = hp.nextvlad_groups
        k = hp.nextvlad_cluster_size
        de = lam * d
        p = de // g  # per-group dim
        mask = frame_mask(num_frames, f, jnp.float32)

        expand_w = self.param(
            "expand_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, de),
            jnp.float32,
        )
        xe = jnp.einsum(
            "bfd,de->bfe",
            features.astype(hp.dtype),
            expand_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )  # [B, F, De]

        attn_w = self.param(
            "group_attention_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (de, g),
            jnp.float32,
        )
        attn_b = self.param(
            "group_attention_bias", nn.initializers.zeros, (g,), jnp.float32
        )
        alpha = nn.sigmoid(
            jnp.einsum(
                "bfe,eg->bfg",
                xe.astype(hp.dtype),
                attn_w.astype(hp.dtype),
                preferred_element_type=jnp.float32,
            )
            + attn_b
        )  # [B, F, G]

        cluster_w = self.param(
            "cluster_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (de, g * k),
            jnp.float32,
        )
        act = jnp.einsum(
            "bfe,ec->bfc",
            xe.astype(hp.dtype),
            cluster_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, g, k)
        assign = nn.softmax(act, axis=-1)
        assign = assign * alpha[:, :, :, None]
        assign = assign * mask[:, :, None, None]

        centers = self.param(
            "cluster_weights2",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (k, p),
            jnp.float32,
        )
        xg = xe.reshape(b, f, g, p)
        vlad = jnp.einsum(
            "bfgk,bfgp->bkp",
            assign.astype(hp.dtype),
            xg.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        a_sum = jnp.sum(assign, axis=(1, 2))  # [B, K]
        vlad = vlad - a_sum[:, :, None] * centers[None, :, :]

        vlad = l2_normalize(vlad, axis=2)
        vlad = vlad.reshape(b, k * p)
        vlad = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="vlad_bn",
        )(vlad)

        hidden_w = self.param(
            "hidden1_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(k * p)),
            (k * p, hp.nextvlad_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            vlad.astype(hp.dtype),
            hidden_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        hidden = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="hidden1_bn",
        )(hidden)
        hidden = nn.relu(hidden)
        hidden = ContextGate(
            add_batch_norm=True, dtype=hp.dtype, name="context_gate"
        )(hidden, train=train)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * l2_loss(expand_w, cluster_w, hidden_w)
        return out
