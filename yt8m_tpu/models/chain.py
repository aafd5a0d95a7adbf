"""Chaining models — cascades of classifiers where each stage consumes the
input representation concatenated with the previous stage's predictions
(projected), and intermediate predictions receive auxiliary supervision.

Reference: fork `all_video_models/chain_*.py` + frame variants; the second
novel structure of the Monkeytyping paper (SURVEY.md §2.2). The train step
adds `chain_aux_loss_weight * CE(aux_pred)` per intermediate stage
(see train/step.py :: make_train_step).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import ensure_float, frame_mask
from yt8m_tpu.models.heads import MoeHead, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.netvlad import _NetVladAggregation
from yt8m_tpu.models.registry import register


class _ChainStack(nn.Module):
    """The shared chain: `stages` MoE heads; stage i>0 sees
    [x, proj(pred_{i-1})]."""

    hp: ModelHParams

    @nn.compact
    def __call__(self, x, train: bool = False):
        hp = self.hp
        preds = None
        aux = []
        reg_total = jnp.float32(0.0)
        for stage in range(hp.chain_stages):
            if preds is None:
                stage_in = x
            else:
                proj = self.param(
                    f"chain_proj{stage}",
                    nn.initializers.normal(
                        1.0 / jnp.sqrt(hp.vocab_size)
                    ),
                    (hp.vocab_size, hp.chain_hidden_size),
                    jnp.float32,
                )
                proj_pred = jnp.dot(
                    preds.astype(hp.dtype),
                    proj.astype(hp.dtype),
                    preferred_element_type=jnp.float32,
                )
                proj_pred = nn.relu(proj_pred)
                stage_in = jnp.concatenate([x, proj_pred], axis=-1)
                reg_total = reg_total + hp.l2_penalty * l2_loss(proj)
            out = MoeHead(
                vocab_size=hp.vocab_size,
                num_mixtures=hp.moe_num_mixtures,
                l2_penalty=hp.moe_l2_penalty,
                dtype=hp.dtype,
                use_pallas=hp.moe_head_pallas,
                name=f"stage{stage}",
            )(stage_in, train=train)
            if preds is not None:
                aux.append(preds)
            preds = out["predictions"]
            reg_total = reg_total + out["regularization_loss"]
        return {
            "predictions": preds,
            "aux_predictions": aux,
            "regularization_loss": reg_total,
        }


@register("ChainMoeModel", frame_level=False)
class ChainMoeModel(nn.Module):
    """Video-level chain of MoE heads over mean features."""

    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames=None, train: bool = False, **kw):
        return _ChainStack(hp=self.hp, name="chain")(features, train=train)


@register("ChainFrameModel", frame_level=True)
class ChainFrameModel(nn.Module):
    """Frame-level chain over the masked mean-pooled frame features."""

    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        features = ensure_float(features)
        mask = frame_mask(num_frames, features.shape[1], features.dtype)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(features * mask[:, :, None], axis=1) / denom
        return _ChainStack(hp=self.hp, name="chain")(pooled, train=train)


@register("ChainNetVladModel", frame_level=True)
class ChainNetVladModel(nn.Module):
    """NetVLAD aggregation feeding a chain of MoE stages."""

    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        mask = frame_mask(num_frames, features.shape[1], jnp.float32)
        vlad, vlad_reg = _NetVladAggregation(
            cluster_size=hp.netvlad_cluster_size,
            add_batch_norm=hp.netvlad_add_batch_norm,
            dtype=hp.dtype,
            use_pallas=hp.netvlad_use_pallas,
            fused_train=hp.netvlad_fused_train,
            name="vlad",
        )(features, num_frames, mask, train=train)
        hidden_weights = self.param(
            "hidden1_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(hp.netvlad_cluster_size)),
            (vlad.shape[-1], hp.netvlad_hidden_size),
            jnp.float32,
        )
        hidden = jnp.dot(
            vlad.astype(hp.dtype),
            hidden_weights.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        from yt8m_tpu.models.norm import batch_norm

        hidden = batch_norm(train, "hidden1_bn", hp.bn_axis)(hidden)
        hidden = nn.relu(hidden)
        out = _ChainStack(hp=self.hp, name="chain")(hidden, train=train)
        out["regularization_loss"] = out["regularization_loss"] + (
            hp.l2_penalty * (vlad_reg + l2_loss(hidden_weights))
        )
        return out
