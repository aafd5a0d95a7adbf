"""Recurrent frame models: stacked LSTM/GRU, uni- and bi-directional.

Reference: frame_level_models.py :: LstmModel (stacked BasicLSTMCell via
dynamic_rnn(sequence_length=num_frames)) plus the fork's bidirectional
LSTM/GRU variants (SURVEY.md §2.2).

TPU design: time-major `lax.scan` with a fused gate matmul per step
([B, D+H] x [D+H, 4H] — one MXU call per layer-step) and mask-gated carry:
for t >= num_frames the carry passes through unchanged, so the "final"
state equals the state at the last real frame — exactly dynamic_rnn's
sequence_length semantics. The backward direction scans reversed time with
the same gate, so its final state has consumed exactly the valid prefix.

Cell equations match TF1 (BasicLSTMCell with forget_bias=1.0, GRUCell with
bias 1.0 on the update/reset gates) so hyperparameters transfer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from yt8m_tpu.models.frame_utils import (
    ensure_float,
    frame_mask,
    frame_pooling,
)
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.models.registry import register
from yt8m_tpu.models.video import make_classifier_head


class _LstmLayer(nn.Module):
    hidden: int
    dtype: Any = jnp.float32
    reverse: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, xs, mask, train: bool = False):
        """xs [F, B, D] time-major, mask [F, B, 1] -> (outputs [F,B,H],
        final (c, h))."""
        f, b, d = xs.shape
        h = self.hidden
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (d + h, 4 * h),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * h,), jnp.float32)

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
        )

        interpret = pallas_interpret_forced()
        if (
            self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or interpret)
        ):
            # Fused path: batched input projection + Pallas recurrence
            # with W_h resident in VMEM. Training uses the custom-VJP
            # variant (kernels/lstm_train.py — forward streams gate/cell
            # residuals, reverse-time kernel emits dZ); inference uses the
            # residual-free kernel (kernels/lstm.py).
            from yt8m_tpu.kernels.lstm import lstm_recurrence
            from yt8m_tpu.kernels.lstm_train import (
                lstm_recurrence_trainable,
            )

            num_frames = jnp.sum(mask[:, :, 0], axis=0).astype(jnp.int32)
            wx, whh = kernel[:d], kernel[d:]
            xp = jnp.einsum(
                "fbd,dg->fbg",
                xs.astype(jnp.bfloat16),
                wx.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if self.reverse:
                xp = jnp.flip(xp, axis=0)
            if train:
                # tb=64: the residual-streaming forward carries extra
                # VMEM output blocks (gates + cell states).
                outputs, (final_c, final_h) = lstm_recurrence_trainable(
                    xp, num_frames, whh, bias, self.reverse, 64, interpret
                )
            else:
                outputs, (final_c, final_h) = lstm_recurrence(
                    xp, num_frames, whh, bias, reverse=self.reverse,
                    interpret=interpret,
                )
            if self.reverse:
                outputs = jnp.flip(outputs, axis=0)
            return outputs, (final_c, final_h)

        kernel_c = kernel.astype(self.dtype)

        def step(carry, inp):
            c, hid = carry
            x, m = inp
            zin = jnp.concatenate([x, hid], axis=-1).astype(self.dtype)
            z = (
                jnp.dot(zin, kernel_c, preferred_element_type=jnp.float32)
                + bias
            )
            i, j, fgate, o = jnp.split(z, 4, axis=-1)
            new_c = c * nn.sigmoid(fgate + 1.0) + nn.sigmoid(i) * jnp.tanh(j)
            new_h = jnp.tanh(new_c) * nn.sigmoid(o)
            new_c = jnp.where(m > 0, new_c, c)
            new_h = jnp.where(m > 0, new_h, hid)
            return (new_c, new_h), new_h

        init = (
            jnp.zeros((b, h), jnp.float32),
            jnp.zeros((b, h), jnp.float32),
        )
        (final_c, final_h), outputs = jax.lax.scan(
            step, init, (xs, mask), reverse=self.reverse
        )
        return outputs, (final_c, final_h)


class _GruLayer(nn.Module):
    hidden: int
    dtype: Any = jnp.float32
    reverse: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, xs, mask, train: bool = False):
        f, b, d = xs.shape
        h = self.hidden
        gate_kernel = self.param(
            "gate_kernel",
            nn.initializers.glorot_uniform(),
            (d + h, 2 * h),
            jnp.float32,
        )
        gate_bias = self.param(
            "gate_bias", nn.initializers.ones, (2 * h,), jnp.float32
        )
        cand_kernel = self.param(
            "candidate_kernel",
            nn.initializers.glorot_uniform(),
            (d + h, h),
            jnp.float32,
        )
        cand_bias = self.param(
            "candidate_bias", nn.initializers.zeros, (h,), jnp.float32
        )

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
        )

        interpret = pallas_interpret_forced()
        if (
            self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or interpret)
        ):
            # Fused path: batched input projections + Pallas recurrence
            # with Whg/Whc resident in VMEM. Training uses the custom-VJP
            # variant (kernels/gru_train.py).
            from yt8m_tpu.kernels.gru import gru_recurrence
            from yt8m_tpu.kernels.gru_train import (
                gru_recurrence_trainable,
            )

            num_frames = jnp.sum(mask[:, :, 0], axis=0).astype(jnp.int32)
            xg = jnp.einsum(
                "fbd,dg->fbg",
                xs.astype(jnp.bfloat16),
                gate_kernel[:d].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            xc = jnp.einsum(
                "fbd,dg->fbg",
                xs.astype(jnp.bfloat16),
                cand_kernel[:d].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if self.reverse:
                xg = jnp.flip(xg, axis=0)
                xc = jnp.flip(xc, axis=0)
            if train:
                outputs, final_h = gru_recurrence_trainable(
                    xg, xc, num_frames, gate_kernel[d:], cand_kernel[d:],
                    gate_bias, cand_bias, self.reverse, 64, interpret,
                )
            else:
                outputs, final_h = gru_recurrence(
                    xg, xc, num_frames, gate_kernel[d:], cand_kernel[d:],
                    gate_bias, cand_bias, reverse=self.reverse,
                    interpret=interpret,
                )
            if self.reverse:
                outputs = jnp.flip(outputs, axis=0)
            return outputs, (final_h, final_h)

        gk = gate_kernel.astype(self.dtype)
        ck = cand_kernel.astype(self.dtype)

        def step(hid, inp):
            x, m = inp
            zin = jnp.concatenate([x, hid], axis=-1).astype(self.dtype)
            gates = nn.sigmoid(
                jnp.dot(zin, gk, preferred_element_type=jnp.float32)
                + gate_bias
            )
            r, u = jnp.split(gates, 2, axis=-1)
            cin = jnp.concatenate([x, r * hid], axis=-1).astype(self.dtype)
            cand = jnp.tanh(
                jnp.dot(cin, ck, preferred_element_type=jnp.float32)
                + cand_bias
            )
            new_h = u * hid + (1.0 - u) * cand
            new_h = jnp.where(m > 0, new_h, hid)
            return new_h, new_h

        init = jnp.zeros((b, h), jnp.float32)
        final_h, outputs = jax.lax.scan(
            step, init, (xs, mask), reverse=self.reverse
        )
        return outputs, (final_h, final_h)


def _run_rnn(
    module_cls,
    features,
    num_frames,
    layers: int,
    hidden: int,
    dtype,
    bidirectional: bool,
    pooling: str,
    train: bool = False,
    use_pallas: bool = True,
):
    """features [B, F, D] -> pooled [B, H * dirs]."""
    features = ensure_float(features)
    b, f, d = features.shape
    xs = jnp.transpose(features, (1, 0, 2))  # time-major
    mask_bt = frame_mask(num_frames, f, jnp.float32)  # [B, F]
    mask = jnp.transpose(mask_bt)[:, :, None]  # [F, B, 1]

    def stack(reverse: bool, tag: str):
        h_in = xs
        final_h = None
        for layer in range(layers):
            outputs, (_c, final_h) = module_cls(
                hidden=hidden,
                dtype=dtype,
                reverse=reverse,
                use_pallas=use_pallas,
                name=f"{tag}_layer{layer}",
            )(h_in, mask, train=train)
            h_in = outputs
        return h_in, final_h

    outs_fw, last_fw = stack(False, "fw")
    if bidirectional:
        outs_bw, last_bw = stack(True, "bw")
        outputs = jnp.concatenate([outs_fw, outs_bw], axis=-1)
        last = jnp.concatenate([last_fw, last_bw], axis=-1)
    else:
        outputs, last = outs_fw, last_fw

    if pooling == "last":
        return last
    pooled = frame_pooling(
        jnp.transpose(outputs, (1, 0, 2)), pooling, mask_bt
    )
    return pooled


class _RnnModelBase(nn.Module):
    hp: ModelHParams
    cell: str = "lstm"
    bidirectional: bool = False

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        if self.cell == "lstm":
            cls, layers, hidden = _LstmLayer, hp.lstm_layers, hp.lstm_cells
        else:
            cls, layers, hidden = _GruLayer, hp.gru_layers, hp.gru_cells
        pooled = _run_rnn(
            cls,
            features,
            num_frames,
            layers=layers,
            hidden=hidden,
            dtype=hp.dtype,
            bidirectional=self.bidirectional,
            pooling=hp.lstm_pooling,
            train=train,
            use_pallas=hp.lstm_use_pallas,
        )
        return make_classifier_head(hp)(pooled)


@register("LstmModel", frame_level=True)
class LstmModel(_RnnModelBase):
    cell: str = "lstm"
    bidirectional: bool = False


@register("GruModel", frame_level=True)
class GruModel(_RnnModelBase):
    cell: str = "gru"
    bidirectional: bool = False


@register("BiLstmModel", frame_level=True)
class BiLstmModel(_RnnModelBase):
    cell: str = "lstm"
    bidirectional: bool = True


@register("BiGruModel", frame_level=True)
class BiGruModel(_RnnModelBase):
    cell: str = "gru"
    bidirectional: bool = True
