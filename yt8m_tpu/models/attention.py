"""Attention-pooling frame models.

Reference: fork `all_frame_models/attention_*.py` — "attention pooling",
one of the Monkeytyping paper's two novel structures (SURVEY.md §2.2):
learned per-head frame scores, masked softmax over time, per-head weighted
sums concatenated into the video representation.

TPU notes: training runs the jnp graph (scores are one [B*F, D] x [D, H]
matmul; padding masked with -inf before the time softmax). Inference runs
the fused Pallas kernel (kernels/attention_pool.py): dequantize + scores +
masked softmax + weighted sum in one VMEM-resident pass per video.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from yt8m_tpu.kernels.attention_pool import attention_pool
from yt8m_tpu.models.frame_utils import ensure_float, frame_mask
from yt8m_tpu.models.heads import l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


class _AttentionPool(nn.Module):
    heads: int
    dtype: object = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, frames, num_frames, mask, train: bool = False):
        """frames [B, F, D] (u8 or f32), mask [B, F] -> [B, heads * D]."""
        b, f, d = frames.shape
        h = self.heads
        query = self.param(
            "attention_query",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, h),
            jnp.float32,
        )
        from yt8m_tpu.kernels import kernels_enabled, static_shape

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
            pooled = attention_pool(
                frames, num_frames, query, dtype=self.dtype,
            )
            return pooled.reshape(b, h * d), l2_loss(query)

        x = ensure_float(frames)
        scores = jnp.dot(
            x.reshape(b * f, d).astype(self.dtype),
            query.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, h)
        scores = jnp.where(mask[:, :, None] > 0, scores, -1e9)
        attn = nn.softmax(scores, axis=1)  # over time
        pooled = jnp.einsum(
            "bfh,bfd->bhd",
            attn.astype(self.dtype),
            x.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return pooled.reshape(b, h * d), l2_loss(query)


@register("AttentionPoolingModel", frame_level=True)
class AttentionPoolingModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        mask = frame_mask(num_frames, features.shape[1], jnp.float32)
        pooled, reg = _AttentionPool(
            heads=hp.attention_heads,
            dtype=hp.dtype,
            use_pallas=hp.attention_use_pallas,
            name="attention",
        )(features, num_frames, mask, train=train)

        proj = self.param(
            "proj_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(pooled.shape[-1])),
            (pooled.shape[-1], hp.attention_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            pooled.astype(hp.dtype),
            proj.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        from yt8m_tpu.models.norm import batch_norm

        hidden = batch_norm(train, "proj_bn", hp.bn_axis)(hidden)
        hidden = nn.relu(hidden)

        out = make_classifier_head(hp)(hidden, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * (reg + l2_loss(proj))
        return out


@register("MultiHeadAttentionModel", frame_level=True)
class MultiHeadAttentionModel(nn.Module):
    """Scaled dot-product variant: projected keys/values, learned queries.

    k = frames @ W_k;  score_h = <k, q_h> / sqrt(dk);  masked softmax over
    time; per-head pooled values concatenated -> classifier.
    """

    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        features = ensure_float(features)
        b, f, d = features.shape
        h = hp.attention_heads
        dk = hp.attention_hidden_size
        mask = frame_mask(num_frames, f, jnp.float32)

        wk = self.param(
            "key_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, dk),
            jnp.float32,
        )
        wv = self.param(
            "value_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (d, dk),
            jnp.float32,
        )
        queries = self.param(
            "queries",
            nn.initializers.normal(1.0),
            (h, dk),
            jnp.float32,
        )
        keys = jnp.dot(
            features.reshape(b * f, d).astype(hp.dtype),
            wk.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, dk)
        values = jnp.dot(
            features.reshape(b * f, d).astype(hp.dtype),
            wv.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, dk)
        scores = jnp.einsum(
            "bfk,hk->bfh", keys, queries, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(dk))
        scores = jnp.where(mask[:, :, None] > 0, scores, -1e9)
        attn = nn.softmax(scores, axis=1)
        pooled = jnp.einsum(
            "bfh,bfk->bhk",
            attn.astype(hp.dtype),
            values.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, h * dk)

        out = make_classifier_head(hp)(pooled, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * l2_loss(wk, wv, queries)
        return out
