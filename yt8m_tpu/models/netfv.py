"""NetFV — learnable Fisher-vector aggregation.

Reference lineage: the NetVLAD-family zoos of the 2017 challenge (WILLOW /
Monkeytyping-era repos) include a NetFV variant alongside NetVLAD: the
same learned soft assignment, but aggregating BOTH first- and
second-order residual statistics against learned cluster centres and
(diagonal) covariances:

    assign = softmax(frames @ W_c [+BN]) * mask           [B, F, K]
    fv1[k] = sum_f assign * (x - mu_k) / sigma_k          [B, K, D]
    fv2[k] = sum_f assign * ((x - mu_k)^2 / sigma_k^2 - 1)
    intra-normalise each, concat -> [B, 2*K*D], L2 norm, FC -> head.

TPU notes: fv1 is the NetVLAD einsum; fv2 adds one more
[B,F,K] x [B,F,D] einsum on x^2 (expanded square), all MXU-dense.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    l2_normalize,
)
from yt8m_tpu.models.heads import l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


@register("NetFVModel", frame_level=True)
class NetFVModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        x = ensure_float(features)
        b, f, d = x.shape
        k = hp.netvlad_cluster_size
        mask = frame_mask(num_frames, f, jnp.float32)

        cluster_w = self.param(
            "cluster_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, k),
            jnp.float32,
        )
        mu = self.param(
            "cluster_centers",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (k, d),
            jnp.float32,
        )
        # softplus keeps the diagonal deviations positive.
        sigma_raw = self.param(
            "covar_weights",
            nn.initializers.ones,
            (k, d),
            jnp.float32,
        )
        sigma = jnp.maximum(nn.softplus(sigma_raw), 1e-3)

        act = jnp.einsum(
            "bfd,dk->bfk",
            x.astype(hp.dtype),
            cluster_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        if hp.netvlad_add_batch_norm:
            from yt8m_tpu.models.norm import batch_norm

            act = batch_norm(train, "cluster_bn", hp.bn_axis)(
                act.reshape(b * f, k)
            ).reshape(b, f, k)
        assign = nn.softmax(act, axis=-1) * mask[:, :, None]

        a_sum = jnp.sum(assign, axis=1)  # [B, K]
        sx = jnp.einsum(
            "bfk,bfd->bkd",
            assign.astype(hp.dtype),
            x.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        sx2 = jnp.einsum(
            "bfk,bfd->bkd",
            assign.astype(hp.dtype),
            (x * x).astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        # First order: (sum a*x - a_sum*mu) / sigma
        fv1 = (sx - a_sum[:, :, None] * mu[None]) / sigma[None]
        # Second order: (sum a*x^2 - 2 mu sum a*x + a_sum mu^2)/sigma^2 - a_sum
        fv2 = (
            sx2 - 2.0 * mu[None] * sx + a_sum[:, :, None] * mu[None] ** 2
        ) / (sigma[None] ** 2) - a_sum[:, :, None]

        def normed(v):
            v = l2_normalize(v, axis=2)
            v = v.reshape(b, k * d)
            return l2_normalize(v, axis=1)

        fv = jnp.concatenate([normed(fv1), normed(fv2)], axis=1)

        hidden_w = self.param(
            "hidden1_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(k)),
            (2 * k * d, hp.netvlad_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            fv.astype(hp.dtype),
            hidden_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        from yt8m_tpu.models.norm import batch_norm

        hidden = batch_norm(train, "hidden1_bn", hp.bn_axis)(hidden)
        hidden = nn.relu(hidden)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * (l2_loss(cluster_w, hidden_w))
        return out
