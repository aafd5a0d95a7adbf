"""Device mesh + sharding policy.

Reference parallelism (SURVEY.md §2.4/§2.5): in-graph GPU towers plus async
grpc parameter servers. TPU-native replacement: ONE SPMD program under jit
over a ('data', 'model') Mesh — batch dims sharded over 'data', gradient
all-reduce inserted by GSPMD over ICI; the 4716-class heads optionally
sharded over 'model' (tensor parallel) for memory headroom.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- tensor-parallel parameter policy ------------------------------------

# Kernels whose OUTPUT dim is vocab-scaled (gates/experts of the MoE head,
# the logistic head, DBoF's 8k cluster layer) are shardable on their last
# axis; everything else is replicated.
_TP_SHARDABLE_SUFFIXES = (
    "gates_kernel",
    "experts_kernel",
    "experts_bias",
    "logistic_kernel",
    "logistic_bias",
    "cluster_kernel",
)


def param_spec(
    path: str, value, mesh: Mesh, fsdp_min_size: int = 0
) -> P:
    """PartitionSpec for one parameter given its flattened path.

    Policy: TP-shardable head kernels shard their LAST dim over 'model';
    otherwise, when fsdp_min_size > 0, any parameter with at least that
    many elements shards dim 0 over 'data' (FSDP-style — parameters AND
    their Adam state live sharded; GSPMD inserts the all-gather on use
    and reduce-scatters the gradients). Small params stay replicated.
    """
    if mesh.shape[MODEL_AXIS] > 1:
        leaf = path.split("/")[-1]
        if leaf in _TP_SHARDABLE_SUFFIXES and value.ndim >= 1:
            if value.shape[-1] % mesh.shape[MODEL_AXIS] == 0:
                spec = [None] * (value.ndim - 1) + [MODEL_AXIS]
                return P(*spec)
    if (
        fsdp_min_size
        and mesh.shape[DATA_AXIS] > 1
        and value.ndim >= 1
        and value.size >= fsdp_min_size
        and value.shape[0] % mesh.shape[DATA_AXIS] == 0
    ):
        spec = [DATA_AXIS] + [None] * (value.ndim - 1)
        return P(*spec)
    return P()


def _flat_path(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tree_param_shardings(tree, mesh: Mesh, fsdp_min_size: int = 0):
    """Map a pytree of arrays to NamedShardings per the TP/FSDP policy."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, v: NamedSharding(
            mesh, param_spec(_flat_path(kp), v, mesh, fsdp_min_size)
        ),
        tree,
    )


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with dim-0 sharding (ids stay host-side).

    Single process: a plain sharded device_put. Multi-host: each process
    holds ITS shard of the global batch (the reader is file-sharded per
    host) and the global array is assembled without any cross-host copy.
    """
    sh = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if k == "id":  # video ids stay host-side (not a device tensor)
            continue
        if multiprocess:
            out[k] = jax.make_array_from_process_local_data(sh, v)
        else:
            out[k] = jax.device_put(v, sh)
    return out
