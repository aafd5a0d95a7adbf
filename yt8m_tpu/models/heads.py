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
    def __call__(self, x, train: bool = False):
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
    # Default ON since r3. The fused head kernel wins in isolation
    # (2.1 vs 2.9 ms at B=2048, C=4716); an approx_max_k CONSUMING its
    # Pallas output pays a ~1 ms boundary penalty (why r2 shipped it
    # off), but the serving paths now pair it with the Pallas exact
    # top-k (kernels/topk.py :: serving_topk), where no penalty exists:
    # full serving step 11.08 vs 13.08 ms (+18%). bf16 reduction-order
    # agreement vs the XLA head is the same ~3e-3 class as the default
    # DBoF kernel. --moe_head_pallas=False opts out. See BENCH_NOTES.md
    # "Pallas tail chain".
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        from yt8m_tpu.kernels import (
            kernels_enabled,
            pallas_interpret_forced,
            static_shape,
        )

        m = self.num_mixtures
        gate_kernel = self.param(
            "gates_kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.vocab_size * (m + 1)),
            jnp.float32,
        )
        expert_kernel = self.param(
            "experts_kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.vocab_size * m),
            jnp.float32,
        )
        expert_bias = self.param(
            "experts_bias", nn.initializers.zeros,
            (self.vocab_size * m,), jnp.float32,
        )
        reg = self.l2_penalty * l2_loss(gate_kernel, expert_kernel)

        interpret = pallas_interpret_forced()
        use_fused = (
            not train
            and self.use_pallas
            and kernels_enabled()
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or interpret)
            # Polymorphic-batch export traces symbolic dims the kernel's
            # block arithmetic can't resolve — fall back to the XLA head.
            and static_shape(x)
        )
        if use_fused:
            # Fused gates+experts+combine per class tile
            # (kernels/moe_head.py): never materialises the f32
            # [B, C, M+1] softmax / [B, C, M] sigmoid in HBM (~5x the
            # FLOP roofline on the jnp path at C=4716).
            from yt8m_tpu.kernels.moe_head import moe_head_serving

            probs = moe_head_serving(
                x.astype(jnp.float32), gate_kernel, expert_kernel,
                expert_bias, m, dtype=self.dtype, interpret=interpret,
            )
            return {"predictions": probs, "regularization_loss": reg}

        gate_logits = jnp.dot(
            x.astype(self.dtype), gate_kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        expert_logits = (
            jnp.dot(
                x.astype(self.dtype), expert_kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + expert_bias
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
        return {"predictions": probs, "regularization_loss": reg}


class ContextGate(nn.Module):
    """Gated linear unit used by the gated-NetVLAD family.

    Reference: the WILLOW/monkeytyping "context gating":
        y = x * sigmoid(W x [+ b | BN]).
    """

    add_batch_norm: bool = True
    dtype: Any = jnp.float32
    bn_axis: str = ""  # cross-replica BN axis (models/norm.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        gates, _k = _dense(
            self, "gating", x, dim, self.dtype,
            use_bias=not self.add_batch_norm,
        )
        if self.add_batch_norm:
            from yt8m_tpu.models.norm import batch_norm

            gates = batch_norm(train, "gating_bn", self.bn_axis)(gates)
        return x * nn.sigmoid(gates.astype(jnp.float32)).astype(x.dtype)
