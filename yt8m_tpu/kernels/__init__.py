"""Pallas TPU kernels for the hot aggregation ops (BASELINE.json
north_star). Each kernel ships with a jnp oracle and interpret-mode
equivalence tests. Inference models dispatch to the residual-free
kernels; LSTM/GRU training dispatches to the custom-VJP trainable
variants (kernels/lstm_train.py, kernels/gru_train.py).

Set YT8M_DISABLE_PALLAS=1 to force the jnp paths everywhere (e.g. when a
constrained remote-compile relay rejects Mosaic payloads).
Set YT8M_PALLAS_INTERPRET=1 to route the models' fused-kernel dispatch
through Pallas interpret mode on any backend — model-level tests use
this to exercise the real kernel paths on CPU.
"""

import os


def kernels_enabled() -> bool:
    return os.environ.get("YT8M_DISABLE_PALLAS", "0") != "1"


def pallas_interpret_forced() -> bool:
    return os.environ.get("YT8M_PALLAS_INTERPRET", "0") == "1"


# ModelHParams flags that gate Pallas kernels on the TRAINING path
# (custom-VJP recurrences shared by the LSTM/GRU families; the opt-in
# fused VLAD train core). GSPMD cannot partition Mosaic kernels. On
# data-only multi-device meshes the Trainer runs the whole train step
# MANUAL under shard_map (train/step.py :: _make_manual_train_step), so
# these kernels stay ON there; only tensor-parallel meshes keep the
# GSPMD step, where the Trainer forces these flags OFF for the training
# model. Any future train-path kernel MUST register its gate flag here
# or it will crash TP-mesh training at lowering (jax tpu_custom_call
# NotImplementedError).
TRAIN_PATH_KERNEL_FLAGS = (
    "lstm_use_pallas",
    "netvlad_fused_train",
    "nextvlad_train_fused",
)


def static_shape(*arrays) -> bool:
    """True when every dim of every array is a concrete Python int.

    Under `jax.export` with a polymorphic batch (infer/export.py,
    batch_size=0) the traced dims are symbolic `_DimExpr` objects; the
    kernels' block/pad arithmetic (`min(block_b, b)`, ceil-div padding)
    cannot be resolved on those, so every Pallas dispatch site must
    fall back to its XLA path. All other callers (jit over concrete
    batches) see plain ints and dispatch normally.
    """
    return all(
        isinstance(d, int) for a in arrays for d in a.shape
    )
