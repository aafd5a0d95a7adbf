"""Deep-combine chaining model.

Reference: the Monkeytyping fork's strongest chaining variant combines
each stage's input with the previous stage's predictions through a DEEP
(FC+BN+ReLU) mixing block rather than a plain concat-projection
(SURVEY.md §2.2 chaining family; paper §"chaining").

    s_0 = relu(BN(W_0 [x]))
    p_0 = MoE(s_0)
    s_i = relu(BN(W_i [x ; s_{i-1} ; proj(p_{i-1})]))
    p_i = MoE(s_i)
Intermediate p_i receive auxiliary supervision (train/step.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import ensure_float, frame_mask
from yt8m_tpu.models.heads import MoeHead, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register


@register("DeepCombineChainModel", frame_level=True)
class DeepCombineChainModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        x = ensure_float(features)
        mask = frame_mask(num_frames, x.shape[1], x.dtype)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(x * mask[:, :, None], axis=1) / denom

        preds = None
        state = None
        aux = []
        reg = jnp.float32(0.0)
        for stage in range(hp.chain_stages):
            parts = [pooled]
            if state is not None:
                parts.append(state)
            if preds is not None:
                proj = self.param(
                    f"pred_proj{stage}",
                    nn.initializers.normal(1.0 / jnp.sqrt(hp.vocab_size)),
                    (hp.vocab_size, hp.chain_hidden_size // 2),
                    jnp.float32,
                )
                parts.append(
                    nn.relu(
                        jnp.dot(
                            preds.astype(hp.dtype),
                            proj.astype(hp.dtype),
                            preferred_element_type=jnp.float32,
                        )
                    )
                )
                reg = reg + hp.l2_penalty * l2_loss(proj)
            inp = jnp.concatenate(parts, axis=-1)

            mix = self.param(
                f"mix{stage}_weights",
                nn.initializers.normal(1.0 / jnp.sqrt(inp.shape[-1])),
                (inp.shape[-1], hp.chain_hidden_size),
                jnp.float32,
            )
            state = jnp.dot(
                inp.astype(hp.dtype),
                mix.astype(hp.dtype),
                preferred_element_type=jnp.float32,
            )
            from yt8m_tpu.models.norm import batch_norm

            state = batch_norm(train, f"mix{stage}_bn", hp.bn_axis)(state)
            state = nn.relu(state)
            reg = reg + hp.l2_penalty * l2_loss(mix)

            out = MoeHead(
                vocab_size=hp.vocab_size,
                num_mixtures=hp.moe_num_mixtures,
                l2_penalty=hp.moe_l2_penalty,
                dtype=hp.dtype,
                use_pallas=hp.moe_head_pallas,
                name=f"stage{stage}",
            )(state, train=train)
            if preds is not None:
                aux.append(preds)
            preds = out["predictions"]
            reg = reg + out["regularization_loss"]

        return {
            "predictions": preds,
            "aux_predictions": aux,
            "regularization_loss": reg,
        }
