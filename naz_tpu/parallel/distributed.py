"""Multi-host initialization helpers.

On a TPU pod slice each host sees only its local chips until
``jax.distributed.initialize()`` joins them into one global runtime
(SURVEY.md §5.8's TPU-native equivalent of the reference's
``CUDA_VISIBLE_DEVICES`` chain parallelism). After initialization every
module here works unchanged: meshes span the pod, shardings are global,
collectives ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join a multi-host run; no-op on a single host without env config.

    On GCE/GKE TPU VMs the arguments auto-detect from the metadata server;
    pass them explicitly elsewhere. Returns topology facts.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    try:
        if already is None or not jax.distributed.is_initialized():
            kwargs = {}
            if coordinator_address is not None:
                kwargs = dict(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # single-process environment without coordinator config
        pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
