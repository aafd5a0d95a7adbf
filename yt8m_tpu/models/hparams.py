"""Model hyper-parameters — one dataclass covering the reference's flag
surface (the reference scattered tf.app.flags across model files; see
SURVEY.md §5.6). CLI flags with the same names map 1:1 onto these fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelHParams:
    vocab_size: int = 4716
    feature_dim: int = 1152
    max_frames: int = 300
    compute_dtype: str = "bfloat16"

    # video_level_models.py flags
    moe_num_mixtures: int = 2
    # fused MoE-head serving kernel (kernels/moe_head.py); default ON
    # since r3: paired with the Pallas exact top-k (serving_topk) it
    # avoids the approx_max_k-after-Pallas boundary penalty and the
    # full serving step wins 18% (BENCH_NOTES "Pallas tail chain").
    # --moe_head_pallas=False opts back into the XLA head.
    moe_head_pallas: bool = True
    moe_l2_penalty: float = 1e-8
    l2_penalty: float = 1e-8

    # frame_level_models.py :: DbofModel flags
    dbof_cluster_size: int = 8192
    dbof_hidden_size: int = 1024
    dbof_pooling_method: str = "max"  # max | average
    # fused cluster+maxpool kernel on the inference path (kernels/dbof.py)
    dbof_use_pallas: bool = True
    # Opt-in int8 MXU serving path: per-column symmetric int8 quant of
    # the (dequant+BN-folded) cluster weights; ~1.4x the bf16 kernel on
    # the serving hot section (5.8 vs 8.2 ms at B=2048, K=8192) at the
    # cost of <=0.4%-of-column-max weight rounding. Default OFF — the
    # bf16 kernel is the reference-numerics serving contract.
    dbof_int8_serving: bool = False
    dbof_add_batch_norm: bool = True
    sample_random_frames: bool = True
    iterations: int = 30  # frames sampled per video
    video_level_classifier_model: str = "MoeModel"

    # frame_level_models.py :: LstmModel / GRU family flags
    lstm_cells: int = 1024
    lstm_layers: int = 2
    lstm_pooling: str = "last"  # last | max | mean
    rnn_bidirectional: bool = False
    lstm_use_pallas: bool = True  # fused recurrence on inference path
    # Fork RNN variants (SURVEY.md §2.2 "layer-norm cells, residual
    # stacks"): layer-norm on the LSTM gate pre-activations + cell state
    # (TF LayerNormBasicLSTMCell semantics), and residual connections
    # between stacked layers (h_{l+1} = h_l + rnn_l(h_l) for l >= 1).
    lstm_layer_norm: bool = False
    rnn_residual: bool = False
    gru_cells: int = 1024
    gru_layers: int = 2

    # NetVLAD family (fork: all_frame_models/netvlad_model.py-like)
    netvlad_cluster_size: int = 256
    netvlad_hidden_size: int = 1024
    netvlad_add_batch_norm: bool = True
    netvlad_gating: bool = True
    netvlad_sample_frames: int = 0  # 0 = use all (masked) frames
    netvlad_use_pallas: bool = True  # fused kernel on the inference path
    # Fused custom-VJP aggregation core on the TRAINING path
    # (kernels/netvlad_train.py). Default OFF: measured 4% SLOWER than
    # the XLA graph at the reference config (7.0k vs 7.2k videos/s/chip,
    # same session) because the train step is bound by the 302M-param
    # hidden FC + Adam (16ms of 37ms), not aggregation — see BENCH_NOTES
    # round-2 profile. Turn ON to avoid materialising the [B,F,K]
    # assignment (activation-memory headroom at large B*F*K).
    netvlad_fused_train: bool = False

    # Attention pooling family (fork: attention_*.py)
    attention_heads: int = 8
    attention_hidden_size: int = 512
    attention_cluster_size: int = 32
    attention_use_pallas: bool = True  # fused kernel on inference path

    # NeXtVLAD (PAPERS.md arXiv:1811.05014)
    nextvlad_groups: int = 8
    nextvlad_expansion: int = 2
    nextvlad_cluster_size: int = 128
    nextvlad_hidden_size: int = 1024
    # fused serving aggregation kernel (kernels/nextvlad.py)
    nextvlad_use_pallas: bool = True
    # fused custom-VJP TRAIN aggregation (kernels/nextvlad_train.py):
    # the step is aggregation-bound (~86%, BENCH_NOTES r3 profile);
    # measured 1.22x (B=256) / 1.26x (B=512) on-chip, loss parity to
    # 5 digits — default ON like the RNN train cores (single-chip
    # only: the Trainer forces TRAIN_PATH_KERNEL_FLAGS off multi-chip)
    nextvlad_train_fused: bool = True

    # Temporal CNN family (fork CNN variants)
    cnn_filters: int = 1024
    cnn_layers: int = 2
    cnn_kernel: int = 3

    # Chaining family (fork: chain_*.py)
    chain_stages: int = 3
    chain_hidden_size: int = 1024
    chain_aux_loss_weight: float = 0.5

    # Distillation
    distill_alpha: float = 0.5

    # Cross-replica BatchNorm axis for the MANUAL (shard_map) train
    # step (train/step.py): when set, every BN site psum-averages its
    # batch statistics over this mesh axis so per-shard training
    # matches the GSPMD global-batch semantics. Runtime-only: the
    # Trainer sets it on the TRAINING model; user configs and
    # model_flags.json keep "".
    bn_axis: str = ""

    @property
    def dtype(self) -> Any:
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def replace(self, **kw) -> "ModelHParams":
        return dataclasses.replace(self, **kw)


# Serving-time/runtime knobs that stay under the CLI's control when a
# model is rebuilt from a recorded model_flags.json (ensemble members,
# eval/inference rebuild): a run's recorded train-time values must not
# silently override e.g. --dbof_int8_serving or --compute_dtype passed
# at serve time. Everything NOT in this set is STRUCTURAL (cluster
# sizes, layers, mixtures, ...) and is taken from the recording.
RUNTIME_HPARAM_FIELDS = frozenset({
    "compute_dtype", "moe_head_pallas", "dbof_use_pallas",
    "dbof_int8_serving", "lstm_use_pallas", "netvlad_use_pallas",
    "netvlad_fused_train", "attention_use_pallas",
    "nextvlad_use_pallas", "nextvlad_train_fused", "bn_axis",
})
