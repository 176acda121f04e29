"""Multi-host initialization.

The reference is strictly single-process (SURVEY.md §2.3: no
torch.distributed anywhere). Here multi-host runs need exactly one call:
`jax.distributed.initialize()` before any backend use — the mesh code in
parallel/mesh.py then sees all hosts' devices and GSPMD routes gradient
all-reduce over ICI within a slice and DCN across slices.

Activated by the standard JAX env vars (JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID or the TPU pod runtime's automatic
discovery); `maybe_initialize_multihost()` is a no-op on a single host.
"""

from __future__ import annotations

import os


def maybe_initialize_multihost() -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Returns True when distributed init ran. Call before creating arrays.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and n_proc:
        import jax

        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(n_proc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        return True
    # TPU pod runtime: the worker hostnames list has >1 entry only on a
    # multi-host slice, where an argless initialize() auto-discovers the
    # coordinator. Without this, a standard pod launch would silently train
    # one independent model per host.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hostnames:
        import jax

        jax.distributed.initialize()
        return True
    return False


def process_batch_slice(global_batch: int):
    """(start, size) of this process's share of a globally-sharded batch."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} is not divisible by "
            f"{n} processes; images would be silently dropped")
    per = global_batch // n
    return jax.process_index() * per, per
