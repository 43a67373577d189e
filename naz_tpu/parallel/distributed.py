"""Multi-host initialization helpers.

On a TPU pod slice each host sees only its local chips until
``jax.distributed.initialize()`` joins them into one global runtime
(SURVEY.md §5.8's TPU-native equivalent of the reference's
``CUDA_VISIBLE_DEVICES`` chain parallelism). After initialization every
module here works unchanged: meshes span the pod, shardings are global,
collectives ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# Environment signals that a coordinator IS configured (cloud TPU runtime
# metadata, explicit JAX coordination env, or a SLURM/OpenMPI launcher that
# jax's cluster auto-detection understands).
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_ID",
    "OMPI_MCA_orte_hnp_uri",
)


def _coordinator_configured() -> bool:
    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    # a worker LIST only signals multi-host when there is more than one
    # worker (single-chip/single-VM TPU environments set it to one name)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([w for w in workers.split(",") if w.strip()]) > 1


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[int] = None,
) -> dict:
    """Join a multi-host run; no-op on a single host without env config.

    On GCE/GKE TPU VMs the arguments auto-detect from the metadata server;
    pass them explicitly elsewhere. Returns topology facts.

    Failure semantics (round-1 VERDICT fix): "no coordinator configured
    anywhere" degrades to single-host silently — that is the normal
    single-machine path. But if a coordinator WAS requested (explicit
    arguments or coordination env vars present) and initialization fails,
    the error propagates: a genuine pod misconfiguration must not silently
    fall back to a 1-host run that then trains on 1/N of the chips.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and jax.distributed.is_initialized():
        pass
    elif coordinator_address is not None:
        # explicit request: errors propagate
        kw = {}
        if initialization_timeout is not None:
            kw["initialization_timeout"] = initialization_timeout
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    elif _coordinator_configured():
        # env-configured request (cloud TPU / SLURM): errors propagate
        jax.distributed.initialize()
    # else: single-process environment, nothing to join
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
