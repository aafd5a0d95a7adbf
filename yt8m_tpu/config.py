"""Run configuration — the reference's flag surface as one dataclass.

Flag names match train.py / eval.py / inference.py of the reference so
existing scripts port by search-replacing the binary name only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from yt8m_tpu.models.hparams import ModelHParams


def _resolve_hparams(cfg) -> "ModelHParams":
    """Shared resolved_hparams body: feature_dim follows --feature_sizes
    (models take it from the input at trace time, but export/serving
    builds example inputs from hparams — they must agree)."""
    from yt8m_tpu.data.features import get_feature_names_and_sizes

    _, sizes = get_feature_names_and_sizes(
        cfg.feature_names, cfg.feature_sizes
    )
    return cfg.hparams.replace(
        vocab_size=cfg.num_classes,
        max_frames=cfg.max_frames,
        feature_dim=sum(sizes),
    )



@dataclasses.dataclass
class TrainConfig:
    # data (reference: train.py + readers.py flags)
    train_data_pattern: str = ""
    feature_names: str = "mean_rgb"
    feature_sizes: str = "1024"
    frame_features: bool = False
    num_classes: int = 4716
    max_frames: int = 300
    batch_size: int = 1024
    num_epochs: Optional[int] = 5
    # reference default was 8 queue-runner threads; same semantics here:
    # N parser worker THREADS over disjoint file shards (the C++ parser
    # releases the GIL). --reader_processes switches to process workers.
    num_readers: int = 1
    reader_processes: bool = False

    # model / loss selection
    model: str = "LogisticModel"
    label_loss: str = "CrossEntropyLoss"

    # optimisation (train.py flags)
    optimizer: str = "AdamOptimizer"
    base_learning_rate: float = 0.01
    learning_rate_decay: float = 0.95
    learning_rate_decay_examples: int = 4_000_000
    regularization_penalty: float = 1.0
    clip_gradient_norm: float = 1.0
    # bf16 Adam first moment: ~30% less optimizer HBM traffic on the
    # VLAD-family's 302M-param FC (see BENCH_NOTES); float32 = exact.
    adam_mu_dtype: str = "float32"
    # >0: maintain a Polyak/EMA average of the params each step
    # (state.ema_params; serve it with --use_ema_weights) — the
    # train-time equivalent of checkpoint weight-averaging.
    ema_decay: float = 0.0
    # Export the Polyak/EMA average in periodic serving exports
    # (requires --ema_decay > 0). Without it, an --ema_decay run's
    # exports carry the RAW weights and the trainer warns once.
    use_ema_weights: bool = False
    max_steps: Optional[int] = None

    # run management
    train_dir: str = "/tmp/yt8m_model/"
    start_new_model: bool = False
    save_checkpoint_every_n_steps: int = 1000
    # Async checkpoint commit: save() only blocks on the device->host
    # copy; serialization + disk write run on a background thread
    # (orbax async). The final save of a run is always awaited. Default
    # off — the synchronous path is the save-returns-durable reference
    # semantics (tf.train.Saver under Supervisor).
    async_checkpoint: bool = False
    # reference train.py exported a serving graph every N steps (0 = off)
    export_model_steps: int = 0
    max_checkpoints_to_keep: int = 5
    log_every_n_steps: int = 10
    # Fail fast when the training loss goes non-finite (the TF1 stack's
    # NanTensorHook / NanLossDuringTrainingError semantics). Checked at
    # the log_every_n_steps boundary where the loss is already fetched,
    # so the async dispatch pipeline pays no extra device->host sync.
    fail_on_nan_loss: bool = True
    seed: int = 0

    # distillation
    distill_data_pattern: str = ""
    distill_alpha: float = 0.5

    # boosting: npz of per-video loss weights written by
    # `python -m yt8m_tpu.ensemble.boosting` (empty = uniform)
    boost_weights_file: str = ""

    # parallelism
    model_parallel: int = 1
    # FSDP: shard params (and Adam state) with >= this many elements over
    # the data axis; 0 = replicate everything (reference-equivalent)
    fsdp_min_size: int = 0
    num_devices: Optional[int] = None

    # profiling
    profile_dir: str = ""

    hparams: ModelHParams = dataclasses.field(default_factory=ModelHParams)

    def resolved_hparams(self) -> ModelHParams:
        return _resolve_hparams(self)


@dataclasses.dataclass
class EvalConfig:
    eval_data_pattern: str = ""
    feature_names: str = "mean_rgb"
    feature_sizes: str = "1024"
    frame_features: bool = False
    num_classes: int = 4716
    max_frames: int = 300
    batch_size: int = 1024
    model: str = "LogisticModel"
    label_loss: str = "CrossEntropyLoss"
    optimizer: str = "AdamOptimizer"  # must match training (restore tree)
    adam_mu_dtype: str = "float32"    # must match training (restore tree)
    # evaluate the EMA weights (requires training with --ema_decay > 0)
    use_ema_weights: bool = False
    # Direct ensemble evaluation: comma-separated member train dirs
    # (device-side weighted average in one jit; overrides --train_dir)
    ensemble_train_dirs: str = ""
    ensemble_models: str = ""
    ensemble_weights: str = ""
    train_dir: str = "/tmp/yt8m_model/"
    run_once: bool = True
    # Bound for the --run_once=False poll loop: stop after this many
    # checkpoint evaluations; -1 = evaluate every EXISTING checkpoint
    # once (ascending sweep) then exit; None/0 = poll forever (the
    # reference eval.py behaviour).
    max_evaluations: Optional[int] = None
    num_readers: int = 1
    reader_processes: bool = False
    top_k: int = 20
    checkpoint_step: Optional[int] = None
    # On-device metric sparsification: ship per-video top-K triplets to
    # the host instead of dense [B, num_classes] predictions (~25x less
    # device->host traffic + host work at C=4716). Identical to the
    # dense path when (a) every video has <= K positive labels (a DATA
    # property — real YT-8M tops out at ~23 labels/video; the reader
    # writes ground truth verbatim and accumulate_topk WARNS at runtime
    # if a video exceeds K) and (b) no score ties straddle the K
    # boundary (measure-zero for float model outputs; equivalence is
    # tested on-chip). 0 = exact dense reference path, no assumptions.
    device_metric_topk: int = 64
    seed: int = 0
    hparams: ModelHParams = dataclasses.field(default_factory=ModelHParams)

    def resolved_hparams(self) -> ModelHParams:
        return _resolve_hparams(self)


@dataclasses.dataclass
class InferenceConfig:
    input_data_pattern: str = ""
    feature_names: str = "mean_rgb"
    feature_sizes: str = "1024"
    frame_features: bool = False
    num_classes: int = 4716
    max_frames: int = 300
    batch_size: int = 8192
    model: str = "LogisticModel"
    optimizer: str = "AdamOptimizer"  # must match training (restore tree)
    adam_mu_dtype: str = "float32"    # must match training (restore tree)
    # serve the EMA weights (requires training with --ema_decay > 0)
    use_ema_weights: bool = False
    train_dir: str = "/tmp/yt8m_model/"
    output_file: str = ""
    top_k: int = 20
    checkpoint_step: Optional[int] = None
    num_readers: int = 1
    reader_processes: bool = False
    # On-device ensemble serving: comma-separated member train dirs —
    # every member's forward runs in ONE jit over the shared batch and
    # the weighted average happens on device (overrides --train_dir).
    ensemble_train_dirs: str = ""
    ensemble_models: str = ""   # per-member model classes (default: --model)
    ensemble_weights: str = ""  # per-member weights (default: uniform)
    # pre-ensemble dump of dense probabilities (fork inference-pre-ensemble)
    output_probabilities_dir: str = ""
    # Dtype for pre-ensemble dense probability dumps. float32 by default:
    # f16 quantization creates exact ties / 3-decimal resolution in the
    # files used for GAP weight-fitting (0.1%-parity north star).
    output_probabilities_dtype: str = "float32"
    # >0: dump top-N sparse probabilities per video instead of the dense
    # [N, num_classes] matrix (the fork's pre-ensemble storage format —
    # full f32 precision at ~1% of the dense size for N=50 vs 4716).
    output_probabilities_topk: int = 0
    seed: int = 0
    hparams: ModelHParams = dataclasses.field(default_factory=ModelHParams)

    def resolved_hparams(self) -> ModelHParams:
        return _resolve_hparams(self)
