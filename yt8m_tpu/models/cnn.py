"""1-D temporal CNN frame model.

Reference: the fork's CNN variants (SURVEY.md §2.2 "per-model files for
chaining/attention/CNN variants"): stacked temporal convolutions over the
frame axis with mask-aware max pooling, feeding the video-level head.

TPU notes: nn.Conv over time lowers to XLA convolution -> MXU; padding
frames are zeroed before each conv and excluded from the final pool.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    frame_pooling,
)
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


@register("FrameCnnModel", frame_level=True)
class FrameCnnModel(nn.Module):
    hp: ModelHParams

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        x = ensure_float(features)
        b, f, d = x.shape
        mask = frame_mask(num_frames, f, jnp.float32)

        widths = [hp.cnn_filters] * hp.cnn_layers
        for i, width in enumerate(widths):
            x = x * mask[:, :, None]  # keep padding silent through convs
            x = nn.Conv(
                features=width,
                kernel_size=(hp.cnn_kernel,),
                padding="SAME",
                dtype=hp.dtype,
                name=f"conv{i}",
            )(x).astype(jnp.float32)
            from yt8m_tpu.models.norm import batch_norm

            x = batch_norm(train, f"conv{i}_bn", hp.bn_axis)(x)
            x = nn.relu(x)

        pooled = frame_pooling(x, "max", mask)
        return make_classifier_head(hp)(pooled, train=train)
