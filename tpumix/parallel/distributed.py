"""Multi-host (multi-process) support: jax.distributed bootstrap + the
host-local -> global-array data path.

The reference has no distributed story at all (SURVEY.md §5.8: single process,
single device, no torch.distributed/NCCL anywhere).  tpumix's single-host
story is GSPMD over an ICI mesh (tpumix/parallel/mesh.py); this module adds
the pieces that change when the SAME program runs as one process per host
with DCN between hosts:

* :func:`initialize` — idempotent `jax.distributed.initialize` wrapper.  After
  it, ``jax.devices()`` is the GLOBAL device list (all hosts) and the
  mesh helpers in tpumix/parallel/mesh.py work unchanged on top of it;
  collectives ride ICI within a host/pod slice and DCN across.
* :func:`process_count` / :func:`process_index` — safe accessors that work
  uninitialised (1 process).
* :func:`shard_range` — contiguous [lo, hi) work split for this process (the
  loader-side analogue of a DistributedSampler).
* :func:`global_batch` — assemble a jax global array from each process's
  host-local batch shard via ``jax.make_array_from_process_local_data``;
  feeding a pjit'd step with these is the multi-host replacement for
  ``jax.device_put(batch, sharding)`` (which only sees local devices).

Training at reference scale (≤1 M params) never NEEDS multiple hosts — this
exists so catalogue-scale data sweeps (mixing/eval over thousands of songs)
and large synthetic-pretrain batches can use every chip of a multi-host
slice without code changes in the trainer.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Tuple[int, ...]] = None,
) -> bool:
    """Bring up jax.distributed if (and only if) a multi-process run is
    configured; returns True when distributed mode is active.

    Resolution order: explicit args > standard env (``JAX_COORDINATOR_ADDRESS``
    / cluster auto-detection inside jax.distributed) > single-process no-op.
    Safe to call more than once (subsequent calls are no-ops), and safe to
    call in single-process sessions — tests and the CLI call it
    unconditionally.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    # resolve the multi-process config BEFORE touching any jax API that
    # initialises the XLA backend — jax.distributed.initialize() refuses to
    # run once a backend exists, so even an innocent jax.process_count() in
    # this guard would make multi-host bring-up impossible
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    env_i = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_n is not None:
        num_processes = int(env_n)
    if process_id is None and env_i is not None:
        process_id = int(env_i)

    if coordinator_address is None and num_processes in (None, 1):
        # no distributed config — nothing to bring up.  jax.process_count()
        # is safe here (worst case it initialises a single-process backend);
        # deliberately NOT latched so a later call WITH config still reaches
        # jax.distributed.initialize (which then raises its own descriptive
        # error if the backend was already touched).
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def shard_range(n_items: int, index: Optional[int] = None, count: Optional[int] = None) -> Tuple[int, int]:
    """Contiguous ``[lo, hi)`` slice of ``n_items`` owned by this process.

    Remainder items go to the lowest-indexed processes, so every process gets
    either ``ceil`` or ``floor`` of the even share and the union is exact.
    """
    count = process_count() if count is None else count
    index = process_index() if index is None else index
    if not 0 <= index < count:
        raise ValueError(f"process index {index} outside [0, {count})")
    base, extra = divmod(n_items, count)
    lo = index * base + min(index, extra)
    hi = lo + base + (1 if index < extra else 0)
    return lo, hi


def global_batch(local_batch, mesh, batch_axis: str = "dp"):
    """Each process contributes its host-local shard of a leading-axis-sharded
    global batch; returns jax global Arrays usable by a pjit'd step.

    ``local_batch`` is a pytree of numpy arrays holding THIS process's items
    (global_batch_size / process_count each).  On a single process this is
    equivalent to ``shard_batch`` (tpumix/parallel/mesh.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P(batch_axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), x)

    return jax.tree.map(put, local_batch)
