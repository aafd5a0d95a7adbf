"""Video-level classifier heads (reference: video_level_models.py).

TPU notes: both heads are single large matmuls ([B, D] x [D, ~14k]) — ideal
MXU shapes. Compute dtype is configurable (bfloat16 default under jit);
probabilities are returned in float32 for loss/metric stability.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def l2_loss(*kernels) -> jnp.ndarray:
    """tf.nn.l2_loss semantics: sum(w**2) / 2, summed over kernels."""
    total = jnp.float32(0.0)
    for k in kernels:
        total = total + jnp.sum(jnp.square(k.astype(jnp.float32))) / 2.0
    return total


def _dense(mod: nn.Module, name: str, x, features: int, dtype,
           use_bias: bool = True):
    """Linear layer via explicit params (kernel exposed for reg loss)."""
    kernel = mod.param(
        f"{name}_kernel",
        nn.initializers.lecun_normal(),
        (x.shape[-1], features),
        jnp.float32,
    )
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                preferred_element_type=jnp.float32)
    if use_bias:
        bias = mod.param(
            f"{name}_bias", nn.initializers.zeros, (features,), jnp.float32
        )
        y = y + bias
    return y, kernel


class LogisticHead(nn.Module):
    """Single sigmoid FC over the vocabulary.

    Reference: video_level_models.py :: LogisticModel.create_model —
    slim.fully_connected(model_input, vocab_size, sigmoid,
    weights_regularizer=l2(l2_penalty)).
    """

    vocab_size: int = 4716
    l2_penalty: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        logits, kernel = _dense(
            self, "logistic", x, self.vocab_size, self.dtype
        )
        logits = logits.astype(jnp.float32)
        return {
            "predictions": nn.sigmoid(logits),
            "logits": logits,
            "regularization_loss": self.l2_penalty * l2_loss(kernel),
        }


class MoeHead(nn.Module):
    """Per-class mixture-of-experts logistic head.

    Reference: video_level_models.py :: MoeModel.create_model —
      gate  = softmax over (num_mixtures + 1) logits per class (no bias);
              the extra "dummy" expert lets the model abstain;
      exp   = sigmoid FC per (class, mixture);
      prob  = sum_m gate[..., m] * exp[..., m].
    Flag: --moe_num_mixtures (starter default 2; monkeytyping used 4-16).

    Dense per-class mixtures (not routed MoE): every expert computes for
    every example — one [B, D] x [D, C*(2M+1)] matmul, MXU-dense, so expert
    parallelism is unnecessary (SURVEY.md §2.4).
    """

    vocab_size: int = 4716
    num_mixtures: int = 2
    l2_penalty: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = self.num_mixtures
        gate_logits, gate_kernel = _dense(
            self, "gates", x, self.vocab_size * (m + 1), self.dtype,
            use_bias=False,
        )
        expert_logits, expert_kernel = _dense(
            self, "experts", x, self.vocab_size * m, self.dtype
        )
        b = x.shape[0]
        gating = nn.softmax(
            gate_logits.astype(jnp.float32).reshape(
                b, self.vocab_size, m + 1
            ),
            axis=-1,
        )
        expert_probs = nn.sigmoid(
            expert_logits.astype(jnp.float32).reshape(b, self.vocab_size, m)
        )
        probs = jnp.sum(gating[..., :m] * expert_probs, axis=-1)
        reg = self.l2_penalty * l2_loss(gate_kernel, expert_kernel)
        return {"predictions": probs, "regularization_loss": reg}


class ContextGate(nn.Module):
    """Gated linear unit used by the gated-NetVLAD family.

    Reference: the WILLOW/monkeytyping "context gating":
        y = x * sigmoid(W x [+ b | BN]).
    """

    add_batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        gates, _k = _dense(
            self, "gating", x, dim, self.dtype,
            use_bias=not self.add_batch_norm,
        )
        if self.add_batch_norm:
            gates = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="gating_bn",
            )(gates)
        return x * nn.sigmoid(gates.astype(jnp.float32)).astype(x.dtype)
