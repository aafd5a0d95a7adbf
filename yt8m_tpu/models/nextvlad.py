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
        import jax

        hp = self.hp
        b, f, d = features.shape
        lam = hp.nextvlad_expansion
        g = hp.nextvlad_groups
        k = hp.nextvlad_cluster_size
        de = lam * d
        p = de // g  # per-group dim

        expand_w = self.param(
            "expand_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, de),
            jnp.float32,
        )
        attn_w = self.param(
            "group_attention_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (de, g),
            jnp.float32,
        )
        attn_b = self.param(
            "group_attention_bias", nn.initializers.zeros, (g,), jnp.float32
        )
        cluster_w = self.param(
            "cluster_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (de, g * k),
            jnp.float32,
        )
        centers = self.param(
            "cluster_weights2",
            nn.initializers.normal(1.0 / jnp.sqrt(de)),
            (k, p),
            jnp.float32,
        )

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
            static_shape,
        )

        interpret = pallas_interpret_forced()
        kernel_ok = (
            kernels_enabled()
            and not self.is_initializing()
            and (jnp.dtype(hp.dtype) == jnp.bfloat16 or interpret)
            and (jax.default_backend() == "tpu" or interpret)
            and static_shape(features)
        )
        if train and hp.nextvlad_train_fused and kernel_ok:
            # Fused custom-VJP train core (kernels/nextvlad_train.py):
            # the forward is the serving kernel; the backward
            # recomputes per-video in VMEM and accumulates the five
            # weight gradients across the grid — neither direction
            # materialises xe or the [B,F,G,K] assignment in HBM.
            # BatchNorm (cross-batch stats) stays in XLA downstream.
            # CONTRACT: features/num_frames get ZERO cotangents (reader
            # data). Any future caller differentiating through the
            # INPUT features (saliency, input-side distillation) must
            # use the XLA path (nextvlad_train_fused=False) — this one
            # silently returns d(features)=0.
            from yt8m_tpu.kernels.nextvlad_train import (
                nextvlad_aggregate_train,
            )

            from yt8m_tpu.data.quantize import (
                DEQUANT_BIAS,
                DEQUANT_SCALE,
            )

            # positional call: custom_vjp nondiff_argnums are resolved
            # by position
            vlad = nextvlad_aggregate_train(
                features, num_frames, expand_w, attn_w, attn_b,
                cluster_w, centers, g, DEQUANT_SCALE, DEQUANT_BIAS,
                interpret, hp.dtype,
            )
            vlad = vlad.reshape(b, k * p)
        elif (
            not train
            and hp.nextvlad_use_pallas
            and kernel_ok
        ):
            # Fused aggregation (kernels/nextvlad.py): dequant +
            # expansion + group attention + per-group softmax +
            # grouped residual aggregation + intra-norm, one VMEM
            # program per video — never materialises xe [B,F,lam*D] or
            # the [B,F,G,K] assignment in HBM. Takes the RAW (possibly
            # uint8) frames.
            from yt8m_tpu.kernels.nextvlad import nextvlad_aggregate

            vlad = nextvlad_aggregate(
                features, num_frames, expand_w, attn_w, attn_b,
                cluster_w, centers, groups=g, dtype=hp.dtype,
                interpret=interpret,
            )
            vlad = vlad.reshape(b, k * p)
        else:
            vlad = self._jnp_aggregate(
                features, num_frames, expand_w, attn_w, attn_b,
                cluster_w, centers,
            )
        from yt8m_tpu.models.norm import batch_norm

        vlad = batch_norm(train, "vlad_bn", hp.bn_axis)(vlad)

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
        hidden = batch_norm(train, "hidden1_bn", hp.bn_axis)(hidden)
        hidden = nn.relu(hidden)
        hidden = ContextGate(
            bn_axis=hp.bn_axis,
            add_batch_norm=True, dtype=hp.dtype, name="context_gate"
        )(hidden, train=train)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * l2_loss(expand_w, cluster_w, hidden_w)
        return out

    def _jnp_aggregate(
        self, features, num_frames, expand_w, attn_w, attn_b,
        cluster_w, centers,
    ):
        """XLA aggregation path (training, CPU, opt-out): returns the
        intra-normalised flat descriptor [B, K*P]."""
        hp = self.hp
        features = ensure_float(features)
        b, f, d = features.shape
        g = hp.nextvlad_groups
        k = hp.nextvlad_cluster_size
        de = hp.nextvlad_expansion * d
        p = de // g
        mask = frame_mask(num_frames, f, jnp.float32)

        xe = jnp.einsum(
            "bfd,de->bfe",
            features.astype(hp.dtype),
            expand_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )  # [B, F, De]
        alpha = nn.sigmoid(
            jnp.einsum(
                "bfe,eg->bfg",
                xe.astype(hp.dtype),
                attn_w.astype(hp.dtype),
                preferred_element_type=jnp.float32,
            )
            + attn_b
        )  # [B, F, G]
        act = jnp.einsum(
            "bfe,ec->bfc",
            xe.astype(hp.dtype),
            cluster_w.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, g, k)
        assign = nn.softmax(act, axis=-1)
        assign = assign * alpha[:, :, :, None]
        assign = assign * mask[:, :, None, None]

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
        return vlad.reshape(b, k * p)
