"""NetVLAD-LSTM combined model — the BASELINE.json north-star flagship
("NetVLAD-LSTM trained to GAP >= 0.84 on v5e-8 in < 2h").

Two complementary frame-aggregation branches over the same masked
[B, F, D] features, fused before the MoE head:

  * VLAD branch: learnable soft-assignment aggregation
    (_NetVladAggregation, fused Pallas kernel on the inference path)
    -> FC hidden + BN + ReLU                                  [B, Hv]
  * temporal branch: stacked (optionally bidirectional) LSTM over the
    valid frames (custom-VJP fused Pallas recurrence in training,
    residual-free kernel at inference), pooled per hp.lstm_pooling
                                                              [B, Hr]
  concat -> optional context gate -> MoE classifier head.

The VLAD branch captures appearance statistics order-free; the LSTM
branch captures temporal structure — the combination is the fork's
winning recipe (SURVEY.md §2.2 model-zoo rows; ensemble tables of the
Monkeytyping paper pair vlad- and rnn-family members).

TPU notes: both branches are large dense matmuls (MXU-friendly); the
recurrence is the only sequential op and runs as a time-as-grid Pallas
kernel. Branches share the uint8->float dequantize (done once).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import ensure_float, frame_mask
from yt8m_tpu.models.heads import ContextGate, l2_loss
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.netvlad import _BN_EPS, _BN_MOMENTUM, _NetVladAggregation
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.rnn import _LstmLayer, _run_rnn
from yt8m_tpu.models.video import make_classifier_head


class _NetVladLstmBase(nn.Module):
    hp: ModelHParams
    bidirectional: bool = False

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        b, f, d = features.shape
        mask = frame_mask(num_frames, f, jnp.float32)

        # Dequantize once; both branches consume the float view. (The
        # fused inference VLAD kernel prefers raw uint8, but sharing one
        # dequantize wins when the LSTM branch needs floats anyway.)
        x = ensure_float(features)

        # --- VLAD branch -> hidden ---------------------------------------
        vlad, reg = _NetVladAggregation(
            cluster_size=hp.netvlad_cluster_size,
            add_batch_norm=hp.netvlad_add_batch_norm,
            dtype=hp.dtype,
            use_pallas=hp.netvlad_use_pallas,
            fused_train=hp.netvlad_fused_train,
            bn_axis=hp.bn_axis,
            name="vlad",
        )(x, num_frames, mask, train=train)
        hidden_weights = self.param(
            "vlad_hidden_weights",
            nn.initializers.normal(1.0 / jnp.sqrt(hp.netvlad_cluster_size)),
            (vlad.shape[-1], hp.netvlad_hidden_size),
            jnp.float32,
        )
        vh = jnp.dot(
            vlad.astype(hp.dtype),
            hidden_weights.astype(hp.dtype),
            preferred_element_type=jnp.float32,
        )
        if hp.netvlad_add_batch_norm:
            from yt8m_tpu.models.norm import batch_norm

            vh = batch_norm(train, "vlad_hidden_bn", hp.bn_axis)(vh)
        else:
            vh = vh + self.param(
                "vlad_hidden_biases",
                nn.initializers.normal(0.01),
                (hp.netvlad_hidden_size,),
                jnp.float32,
            )
        vh = nn.relu(vh)

        # --- LSTM branch (honours the same flags as LstmModel:
        # --lstm_layer_norm, --rnn_residual) --------------------------------
        rh = _run_rnn(
            functools.partial(_LstmLayer, layer_norm=hp.lstm_layer_norm),
            x,
            num_frames,
            layers=hp.lstm_layers,
            hidden=hp.lstm_cells,
            dtype=hp.dtype,
            bidirectional=self.bidirectional,
            pooling=hp.lstm_pooling,
            train=train,
            use_pallas=hp.lstm_use_pallas and not hp.lstm_layer_norm,
            residual=hp.rnn_residual,
        )

        fused = jnp.concatenate([vh, rh], axis=-1)
        if hp.netvlad_gating:
            fused = ContextGate(
                add_batch_norm=hp.netvlad_add_batch_norm,
                dtype=hp.dtype,
                bn_axis=hp.bn_axis,
                name="context_gate",
            )(fused, train=train)

        out = make_classifier_head(hp)(fused, train=train)
        out["regularization_loss"] = out.get(
            "regularization_loss", 0.0
        ) + hp.l2_penalty * (reg + l2_loss(hidden_weights))
        return out


@register("NetVladLstmModel", frame_level=True)
class NetVladLstmModel(_NetVladLstmBase):
    bidirectional: bool = False


@register("NetVladBiLstmModel", frame_level=True)
class NetVladBiLstmModel(_NetVladLstmBase):
    bidirectional: bool = True
