"""Gain-curve smoothing and sample-level mask stretching.

Parity contracts:
* ``savgol_smooth`` — Savitzky-Golay filtering of per-chunk gain curves with
  window ``num_chunks // 4`` forced odd and polyorder 2 (reference
  inference_utils.py:137-140, ``scipy.signal.savgol_filter`` default
  mode='interp').  Implemented from first principles as a linear operator
  (FIR interior + least-squares polynomial edge fits), so it needs no scipy at
  runtime and has a jit-able fixed-window device variant.
* ``interpolate_mask`` — nearest-neighbour stretch of a per-chunk gain
  sequence to sample level with integer ``interp_coef = tgt_len // len`` and
  last-value tail fill (reference inference_utils.py:12-41), vectorised.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def default_savgol_window(num_chunks: int) -> int:
    """Reference window policy: ``num_chunks // 4``, forced odd
    (inference_utils.py:137-139)."""
    w = int(num_chunks) // 4
    return w if w % 2 else w + 1


@functools.lru_cache(maxsize=64)
def savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """Central Savitzky-Golay FIR coefficients (evaluate the LSQ polynomial
    fit at the window centre).  float64 design, matches scipy.signal.savgol_coeffs."""
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    half = window_length // 2
    # Vandermonde of offsets -half..half; solve for the row of the projection
    # matrix that evaluates the fit at offset 0.
    x = np.arange(-half, half + 1, dtype=np.float64)
    A = np.vander(x, polyorder + 1, increasing=True)  # [w, p+1]
    # fit coeffs c = pinv(A) @ y; value at 0 is c[0] -> row 0 of pinv(A)
    coeffs = np.linalg.pinv(A)[0]  # [w]
    return coeffs


@functools.lru_cache(maxsize=64)
def _savgol_edge_matrix(window_length: int, polyorder: int) -> np.ndarray:
    """Matrix E [half, window] such that ``E @ y[:window]`` gives the
    'interp'-mode leading-edge values: a single polyorder polynomial is fit to
    the first ``window`` samples and evaluated at positions 0..half-1
    (scipy savgol_filter mode='interp' semantics)."""
    half = window_length // 2
    x = np.arange(window_length, dtype=np.float64)
    A = np.vander(x, polyorder + 1, increasing=True)
    P = np.linalg.pinv(A)  # [p+1, w]
    eval_pts = np.vander(np.arange(half, dtype=np.float64), polyorder + 1, increasing=True)
    return eval_pts @ P  # [half, w]


def savgol_smooth(y: np.ndarray, window_length: int, polyorder: int = 2) -> np.ndarray:
    """Savitzky-Golay smoothing over the last axis, scipy 'interp' parity.

    Host-side numpy implementation (the gain curve is ~num_chunks values per
    stem — a tiny sequential epilogue; the heavy lifting lives on-device in the
    batched mixer, tpumix/infer/mixer.py).
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[-1]
    if window_length > n:
        raise ValueError(
            f"window_length {window_length} exceeds signal length {n}"
        )
    if polyorder >= window_length:
        raise ValueError("polyorder must be < window_length")
    half = window_length // 2
    c = savgol_coeffs(window_length, polyorder)
    # interior: correlation with the symmetric coefficient vector
    interior = np.apply_along_axis(
        lambda row: np.convolve(row, c[::-1], mode="valid"), -1, y
    )  # [..., n - w + 1]
    E = _savgol_edge_matrix(window_length, polyorder)
    lead = np.einsum("hw,...w->...h", E, y[..., :window_length])
    # trailing edge: mirror — fit last window, evaluate at final half positions
    tail = np.einsum("hw,...w->...h", E, y[..., ::-1][..., :window_length])[..., ::-1]
    return np.concatenate([lead, interior, tail], axis=-1)


def savgol_smooth_jax(y: jax.Array, window_length: int, polyorder: int = 2) -> jax.Array:
    """Device variant with a *static* window length (for fully-fused pipelines
    where num_chunks is pinned per compiled program)."""
    half = window_length // 2
    c = jnp.asarray(savgol_coeffs(window_length, polyorder), dtype=y.dtype)
    interior = jnp.apply_along_axis(
        lambda row: jnp.convolve(row, c[::-1], mode="valid"), -1, y
    )
    E = jnp.asarray(_savgol_edge_matrix(window_length, polyorder), dtype=y.dtype)
    lead = jnp.einsum("hw,...w->...h", E, y[..., :window_length])
    tail = jnp.einsum("hw,...w->...h", E, y[..., ::-1][..., :window_length])[..., ::-1]
    return jnp.concatenate([lead, interior, tail], axis=-1)


def interpolate_mask_np(spec_mask: np.ndarray, tgt_len: int) -> np.ndarray:
    """Reference-exact nearest-neighbour stretch (inference_utils.py:12-41):
    integer ``interp_coef = tgt_len // len``; value ``j`` fills
    ``[j*coef, (j+1)*coef)`` for ``j < len-1``; the last value fills the rest.

    Implemented as ``repeat`` + tail fill (no 10M-element gather index)."""
    spec_mask = np.asarray(spec_mask)
    n = spec_mask.shape[-1]
    assert n <= tgt_len, "Target mask should be longer than the initial one"
    coef = tgt_len // n
    body = np.repeat(spec_mask, coef, axis=-1)  # [..., n*coef]
    tail = tgt_len - n * coef
    if tail == 0:
        return body
    last = np.broadcast_to(spec_mask[..., -1:], spec_mask.shape[:-1] + (tail,))
    return np.concatenate([body, last], axis=-1)


def interpolate_mask(spec_mask: jax.Array, tgt_len: int) -> jax.Array:
    """jnp variant of :func:`interpolate_mask_np` (vmappable over stems).

    Built as ``repeat`` + broadcast tail (static shapes) rather than a
    ``tgt_len``-element gather: XLA lowers the repeat to broadcast+reshape,
    which is copy-bandwidth on TPU where the 10M-index gather is not."""
    n = spec_mask.shape[-1]
    coef = tgt_len // n
    body = jnp.repeat(spec_mask, coef, axis=-1)  # [..., n*coef]
    tail = tgt_len - n * coef
    if tail == 0:
        return body
    last = jnp.broadcast_to(
        spec_mask[..., -1:], (*spec_mask.shape[:-1], tail)
    )
    return jnp.concatenate([body, last], axis=-1)
