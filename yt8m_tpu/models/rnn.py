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

import functools
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


def _layer_norm(x, gamma, beta, eps: float = 1e-6):
    """Pure layer norm over the last axis (params threaded in so it can
    run inside a lax.scan body)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


class _LstmLayer(nn.Module):
    hidden: int
    dtype: Any = jnp.float32
    reverse: bool = False
    use_pallas: bool = True
    layer_norm: bool = False

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
        # no cell bias under layer norm: the per-gate LN beta subsumes it
        # (TF1 LayerNormBasicLSTMCell), so don't create a dead param.
        bias = (
            None
            if self.layer_norm
            else self.param(
                "bias", nn.initializers.zeros, (4 * h,), jnp.float32
            )
        )

        if self.layer_norm:
            # Fork variant (SURVEY.md §2.2 "layer-norm cells"): TF1
            # LayerNormBasicLSTMCell — LN on each gate pre-activation
            # (per-gate scale/shift; LN beta subsumes the cell bias) and
            # on the new cell state before the output tanh. No fused
            # kernel for this variant: it runs on the scan path.
            ln_scale = self.param(
                "ln_scale", nn.initializers.ones, (5, h), jnp.float32
            )
            ln_bias = self.param(
                "ln_bias", nn.initializers.zeros, (5, h), jnp.float32
            )
            kernel_c = kernel.astype(self.dtype)

            def ln_step(carry, inp):
                c, hid = carry
                x, m = inp
                zin = jnp.concatenate([x, hid], axis=-1).astype(self.dtype)
                z = jnp.dot(
                    zin, kernel_c, preferred_element_type=jnp.float32
                )
                i, j, fgate, o = jnp.split(z, 4, axis=-1)
                i = _layer_norm(i, ln_scale[0], ln_bias[0])
                j = _layer_norm(j, ln_scale[1], ln_bias[1])
                fgate = _layer_norm(fgate, ln_scale[2], ln_bias[2])
                o = _layer_norm(o, ln_scale[3], ln_bias[3])
                new_c = c * nn.sigmoid(fgate + 1.0) + nn.sigmoid(
                    i
                ) * jnp.tanh(j)
                new_h = jnp.tanh(
                    _layer_norm(new_c, ln_scale[4], ln_bias[4])
                ) * nn.sigmoid(o)
                new_c = jnp.where(m > 0, new_c, c)
                new_h = jnp.where(m > 0, new_h, hid)
                return (new_c, new_h), new_h

            init = (
                jnp.zeros((b, h), jnp.float32),
                jnp.zeros((b, h), jnp.float32),
            )
            (final_c, final_h), outputs = jax.lax.scan(
                ln_step, init, (xs, mask), reverse=self.reverse
            )
            return outputs, (final_c, final_h)

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
            static_shape,
        )

        interpret = pallas_interpret_forced()
        # The recurrence kernels compute in bf16 (the serving/training
        # contract); a --compute_dtype=float32 request falls back to the
        # scan path, which honours the dtype exactly (interpret-mode
        # tests keep exercising the kernels at any dtype).
        if (
            self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jnp.dtype(self.dtype) == jnp.bfloat16 or interpret)
            and (jax.default_backend() == "tpu" or interpret)
            # Symbolic dims (polymorphic-batch export) can't trace the
            # kernel's block arithmetic — fall back to the scan path.
            and static_shape(xs)
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
                # tb=128: full MXU rows per sequential grid step. Needs
                # the kernels' raised VMEM cap (the residual-streaming
                # blocks put tb=128 just past the default 16 MB scoped
                # limit); measured 1.06-1.07x over tb=64 at B=256,
                # H=1024 with bitwise-identical outputs
                # (scripts/exp_lstm_train_tileb.py, BENCH_NOTES r3).
                outputs, (final_c, final_h) = lstm_recurrence_trainable(
                    xp, num_frames, whh, bias, self.reverse, 128, interpret
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
            static_shape,
        )

        interpret = pallas_interpret_forced()
        # The recurrence kernels compute in bf16 (the serving/training
        # contract); a --compute_dtype=float32 request falls back to the
        # scan path, which honours the dtype exactly (interpret-mode
        # tests keep exercising the kernels at any dtype).
        if (
            self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jnp.dtype(self.dtype) == jnp.bfloat16 or interpret)
            and (jax.default_backend() == "tpu" or interpret)
            # Symbolic dims (polymorphic-batch export) can't trace the
            # kernel's block arithmetic — fall back to the scan path.
            and static_shape(xs)
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
                # tb=128: full MXU rows per sequential grid step —
                # 1.06-1.07x over tb=64, bitwise-identical (on-chip A/B,
                # scripts/exp_gru_train_tileb.py; same class as the
                # LSTM tiling win). GRU keeps 3 gate blocks live vs
                # LSTM's 4, so it fits the default VMEM cap.
                outputs, final_h = gru_recurrence_trainable(
                    xg, xc, num_frames, gate_kernel[d:], cand_kernel[d:],
                    gate_bias, cand_bias, self.reverse, 128, interpret,
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
    residual: bool = False,
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
            if residual and layer > 0:
                # Fork variant (SURVEY.md §2.2 "residual stacks"):
                # identity skip between equal-width stacked layers
                # (layer 0 projects D -> H, so the skip starts at 1).
                outputs = outputs + h_in
            h_in = outputs
        if residual:
            # "last" must see the residual-summed output, not the top
            # cell's internal state. Masked steps pass the carry through,
            # so the boundary frame holds the last valid output.
            final_h = h_in[0] if reverse else h_in[-1]
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
    force_layer_norm: bool = False  # class-level override of the flag

    @nn.compact
    def __call__(self, features, num_frames, train: bool = False, **kw):
        hp = self.hp
        layer_norm = self.force_layer_norm or hp.lstm_layer_norm
        if self.cell == "lstm":
            layers, hidden = hp.lstm_layers, hp.lstm_cells
            cls = functools.partial(_LstmLayer, layer_norm=layer_norm)
        else:
            # layer-norm cells are an LSTM-family variant (the TF fork's
            # LayerNormBasicLSTMCell has no GRU counterpart).
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
            use_pallas=hp.lstm_use_pallas and not layer_norm,
            residual=hp.rnn_residual,
        )
        return make_classifier_head(hp)(pooled, train=train)


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


@register("LayerNormLstmModel", frame_level=True)
class LayerNormLstmModel(_RnnModelBase):
    """Stacked layer-norm LSTM (fork variant; also reachable as
    --model=LstmModel --lstm_layer_norm=true)."""

    cell: str = "lstm"
    bidirectional: bool = False
    force_layer_norm: bool = True
