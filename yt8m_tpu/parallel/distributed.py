"""Multi-host process-group setup.

Reference: TF_CONFIG -> ClusterSpec with ps/worker jobs and async
parameter-server SGD (train.py [S], SURVEY.md §2.5). TPU-native
replacement: every host runs the SAME SPMD program; jax.distributed wires
the process group, the Mesh spans all devices, and GSPMD's collectives
replace the parameter server entirely.

Environment contract (standard JAX multi-host vars):
    JAX_COORDINATOR_ADDRESS  host:port of process 0
    JAX_NUM_PROCESSES        world size
    JAX_PROCESS_ID           this process's index
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("yt8m_tpu.distributed")

_initialized = False


def maybe_initialize() -> bool:
    """Initialise jax.distributed when the env vars are present.

    Safe to call multiple times and in single-process runs (no-op).
    """
    global _initialized
    if _initialized:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    num = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=num, process_id=pid
    )
    _initialized = True
    log.info(
        "jax.distributed initialised: process %d/%d, %d local devices",
        pid, num, jax.local_device_count(),
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def per_host_batch(global_batch_size: int) -> int:
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n
