"""Backend identification shared by every TPU-gated code path.

Real TPU backends in this codebase come in two names: ``"tpu"`` (direct PJRT)
and ``"axon"`` (the remote-TPU tunnel plugin, which compiles and runs genuine
TPU programs).  Every gate that asks "am I on TPU hardware?" must use
:func:`is_tpu_backend` — round 1 had two call sites answering the question
with different name sets, so the fused Pallas frontend silently fell off the
benchmarked hot path on the axon backend.
"""

from __future__ import annotations

from typing import Optional

TPU_BACKENDS = ("tpu", "axon")


def is_tpu_backend(backend: Optional[str] = None) -> bool:
    """True when ``backend`` (default: the current default backend) is a real
    TPU target — i.e. Pallas kernels compile natively rather than in
    interpreter mode."""
    if backend is None:
        import jax

        backend = jax.default_backend()
    return backend in TPU_BACKENDS
