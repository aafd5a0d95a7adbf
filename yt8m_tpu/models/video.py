"""Video-level models (reference: video_level_models.py).

Input: mean-pooled features [B, D] (float). Output dict with
"predictions" [B, vocab] float32 probabilities.
"""

from __future__ import annotations

import flax.linen as nn

from yt8m_tpu.models.heads import LogisticHead, MoeHead
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register


@register("LogisticModel", frame_level=False)
class LogisticModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames=None, train: bool = False, **kw):
        return LogisticHead(
            vocab_size=self.hp.vocab_size,
            l2_penalty=self.hp.l2_penalty,
            dtype=self.hp.dtype,
            name="tower",
        )(features, train=train)


@register("MoeModel", frame_level=False)
class MoeModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames=None, train: bool = False, **kw):
        return MoeHead(
            vocab_size=self.hp.vocab_size,
            num_mixtures=self.hp.moe_num_mixtures,
            l2_penalty=self.hp.moe_l2_penalty,
            dtype=self.hp.dtype,
            use_pallas=self.hp.moe_head_pallas,
            name="tower",
        )(features, train=train)


def make_classifier_head(hp: ModelHParams, name: str = "video_classifier"):
    """The `--*_video_level_classifier_model` hook every frame model uses."""
    cls_name = hp.video_level_classifier_model
    if cls_name == "MoeModel":
        return MoeHead(
            vocab_size=hp.vocab_size,
            num_mixtures=hp.moe_num_mixtures,
            l2_penalty=hp.moe_l2_penalty,
            dtype=hp.dtype,
            use_pallas=hp.moe_head_pallas,
            name=name,
        )
    if cls_name == "LogisticModel":
        return LogisticHead(
            vocab_size=hp.vocab_size,
            l2_penalty=hp.l2_penalty,
            dtype=hp.dtype,
            name=name,
        )
    raise ValueError(f"unknown video-level classifier {cls_name!r}")
