"""yt8m_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the Monkeytyping
YouTube-8M framework (reference: wangheda/youtube-8m, a fork of
google/youtube-8m).

Capability parity surface (see SURVEY.md §2):
  * TFRecord Example / SequenceExample readers with uint8->float dequantize,
    frame padding/masking to [B, 300, 1152]  (reference: readers.py)
  * Model zoo: Logistic / MoE video-level heads; DBoF, LSTM/GRU, NetVLAD,
    attention-pooling, chaining frame-level models
    (reference: video_level_models.py, frame_level_models.py, fork model dirs)
  * Losses: CrossEntropy / Hinge / Softmax (+ distillation mix)
    (reference: losses.py)
  * Metrics: GAP@20, Hit@1, PERR, mAP (reference: eval_util.py,
    average_precision_calculator.py)
  * train / eval / inference CLIs, checkpointing, ensembling
    (reference: train.py, eval.py, inference.py, fork ensemble scripts)

Design is TPU-first: single SPMD program under jit/pjit, data-parallel
sharding over a jax Mesh, uint8 features on the host->device wire with
on-device dequantize, Pallas kernels for the hot aggregation ops.
"""

__version__ = "0.1.0"
