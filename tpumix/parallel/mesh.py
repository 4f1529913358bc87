"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU with no distributed backend at all
(SURVEY.md §2, §5.8: no torch.distributed/NCCL/MPI anywhere; device selection
at reference inference_utils.py:9).  tpumix scales the TPU way instead:

* a ``jax.sharding.Mesh`` over ICI with named axes — ``dp`` (batch/data
  parallel) x ``sp`` (sequence parallel: STFT frames / song-chunk axis);
* ``jax.jit`` + ``NamedSharding`` annotations (GSPMD): XLA inserts the
  gradient ``psum``, global batch-norm reductions, and conv halo exchanges for
  frame-axis sharding automatically;
* collectives ride ICI; no cross-host DCN is required at this model scale
  (≤1M params — a single v5e chip trains it; the mesh exists to scale *data*
  and *song* throughput).

Everything here works identically on the real TPU mesh and on the CPU
simulation mesh (``--xla_force_host_platform_device_count``) used by tests
and the driver's multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("dp",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one ``dp`` axis.  ``shape`` must multiply to the
    device count used; pass e.g. ``(4, 2)`` with ``("dp", "sp")`` for a 4x2
    data x sequence mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over ``batch_axis``, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: str = "dp"):
    """Device-put a pytree of host arrays with leading-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), batch_axis)), batch
    )


def data_parallel_jit(step_fn, mesh: Mesh, state_ndim_tree=None, donate_state: bool = True):
    """jit a ``(state, *batch) -> (state, aux)`` step for data parallelism:
    state replicated, batch inputs sharded on their leading axis over 'dp'.

    Sharding propagation (GSPMD) handles everything downstream — including the
    psum of gradients implied by the replicated-state output constraint.
    """
    rep = replicated(mesh)

    def annotate(state, *batch):
        state = jax.lax.with_sharding_constraint(state, rep)
        batch = tuple(
            jax.lax.with_sharding_constraint(
                b, batch_sharding(mesh, b.ndim) if getattr(b, "ndim", 0) > 0 else rep
            )
            for b in batch
        )
        out = step_fn(state, *batch)
        return jax.lax.with_sharding_constraint(out, rep)

    return jax.jit(annotate, donate_argnums=(0,) if donate_state else ())
