"""Tracing / profiling utilities.

The reference has no profiling at all — just ``time.time()`` prints
(reference data/dataset.py:287-289, model_trainer.py:39-41; SURVEY.md §5.1).
tpumix provides:

* ``annotate`` — named jax.profiler trace annotations (visible in
  TensorBoard/XProf timelines);
* ``trace_to`` — capture a device trace for a code region;
* ``Stopwatch`` — blocking wall-clock sections (block_until_ready-aware);
* ``measure_throughput`` — the audio-seconds/sec/chip harness used by
  bench.py-style measurements (warm-up, best-of-N, dispatch-chain timing so
  async dispatch cannot fake results).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulates named wall-clock sections; blocks on device results."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        tic = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - tic

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.0f}%)" for k, v in self.sections.items()]
        return "\n".join(lines)


def force(result):
    """Truly materialise a device result on the host.

    NOTE: ``jax.block_until_ready`` does NOT reliably wait on remote-tunnel
    backends (observed on the axon PJRT plugin) — the only trustworthy fence
    is a host transfer.  All tpumix timing goes through this."""
    import numpy as np

    return jax.tree.map(np.asarray, result)


def measure_throughput(
    fn: Callable,
    args: tuple,
    audio_seconds: float,
    reps: int = 5,
    warmup: int = 1,
    make_args: Callable[[int], tuple] = None,
) -> Dict[str, float]:
    """Best-of-``reps`` audio-seconds/sec for ``fn(*args)``.

    Each rep runs the function and forces its result to the host, so async
    dispatch is fully accounted.  The axon runtime memoizes executions with
    identical inputs, so each rep must see different bytes: pass
    ``make_args(rep)`` to supply per-rep inputs; without it, every float
    array argument is perturbed in-place-free by rolling one element per rep
    (statistics-preserving, memoization-defeating).
    Returns ``{"seconds": best, "audio_s_per_s": rate}``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def _perturb(a, rep: int):
        if isinstance(a, np.ndarray) and a.dtype.kind == "f":
            return np.roll(a, rep)
        if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating):
            # device-resident args are the case the perturbation exists for:
            # an identical jax.Array every rep is exactly what the runtime
            # memoizes.  roll keeps the statistics, changes every byte.
            return jnp.roll(a, rep)
        return a

    def _args_for(rep: int) -> tuple:
        if make_args is not None:
            return make_args(rep)
        if rep == 0:
            return args
        return tuple(_perturb(a, rep) for a in args)

    def _materialise(a: tuple) -> tuple:
        # a lazily dispatched jnp.roll would otherwise execute inside the
        # timed region
        for x in a:
            if isinstance(x, jax.Array):
                force(x)
        return a

    for w in range(warmup):
        force(fn(*_args_for(-1 - w)))
    # rep N+1's perturbed inputs are prepared OUTSIDE rep N's timed window
    # (strictly after it — preparation is not overlapped with timing), so at
    # most TWO copies of the (possibly large, device-resident) arguments are
    # alive at once — materialising all reps up-front held reps x the HBM
    # footprint (round-2 advisor finding)
    best = float("inf")
    current = _materialise(_args_for(1))
    for rep in range(reps):
        tic = time.perf_counter()
        force(fn(*current))
        best = min(best, time.perf_counter() - tic)
        if rep + 1 < reps:
            current = _materialise(_args_for(rep + 2))
    return {"seconds": best, "audio_s_per_s": audio_seconds / best}
