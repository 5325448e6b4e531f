"""Multi-host distributed initialization.

TPU-native replacement for `/root/reference/internvl/dist_utils.py:32-104`
(`init_dist` with pytorch/mpi/slurm launchers over NCCL): a single
`jax.distributed.initialize()` call per host. The JAX runtime handles
rendezvous via the coordinator address; all collective traffic then rides
ICI within a slice and DCN across slices, chosen by GSPMD from the mesh
layout — no backend selection or free-port scanning needed.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def init_dist(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (no-op for single-process runs).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud TPU metadata; mirrors the role
    of the reference's `init_dist(launcher, backend)` dispatch
    (`dist_utils.py:32-42`) with none of its launcher-specific branches.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes in (None, 1):
        logger.info("single-process run; skipping jax.distributed.initialize")
        _INITIALIZED = True
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_primary() -> bool:
    return jax.process_index() == 0
