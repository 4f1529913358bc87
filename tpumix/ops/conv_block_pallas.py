"""Fused Pallas conv-block kernel: VALID conv + folded BatchNorm + ReLU in
one VMEM-resident pass.

STATUS: EXPERIMENTAL — semantics verified in interpreter mode
(tests/test_conv_block_pallas.py) but the compiled kernel currently FAULTS
the TPU worker at production shapes, so it is wired into NO production path
and :func:`conv_block_fused` refuses to run on a real TPU backend unless
``TPUMIX_EXPERIMENTAL_PALLAS_CONV=1``.  Round-2 findings for the next
iteration, in chronological order:

1. a register-level ``jnp.concatenate`` of width-shifted VMEM slices is not
   expressible ("offset mismatch on non-concat dimension") — window columns
   cannot be built in-kernel from a plain row block;
2. lane-offset DMA destinations (``cols.at[:, :, j*Cin:(j+1)*Cin]``) are
   rejected for non-128-aligned lane slices — per-tap DMA gathers need
   128-aligned channel groups;
3. with XLA building the column matrix outside and the kernel reduced to
   one aligned halo DMA + kh MXU dots + epilogue, the program compiles but
   the worker crashes at runtime;
4. the crash reproduces in the canonical grid-accumulation form (grid
   (N, tiles, kh), output block as the K-loop accumulator, no
   SUBLANE-OFFSET slices, 128-aligned DMA slices).  NOT yet eliminated as
   suspects: the full-block VMEM reshapes that remain
   (``cols[...].reshape(TH*Wo, K)`` / ``contrib.reshape``), and the manual
   ``make_async_copy`` from an HBM-spec'd operand at a program_id-derived
   offset, which every faulting variant shares.  Next iteration: replace
   the manual DMA (double-buffered PrefetchScalarGridSpec pipelining, or a
   layout where standard disjoint BlockSpecs suffice), and note the
   per-kernel-row DMA re-reads ~kh x the input bytes vs a single halo copy
   — fold back to one halo fetch once the fault is gone.

Why: the khgemm lowering (tpumix/ops/conv_khgemm.py) already fixes the
MXU lane fill for the reference CNN's narrow layers, but under XLA the
window-column build, the kh-reduction and the BN/ReLU epilogue each cross
fusion boundaries with HBM round trips.  This kernel does the whole block —

    y = relu( conv_valid(x, w) * scale + shift )

(``scale``/``shift`` are the inference-time BN fold:
``s = gamma / sqrt(var + eps)``, ``t = (bias - mean) * s + beta``) — on a
``(batch, row-tile, kernel-row)`` grid entirely in VMEM:

* XLA prebuilds the width-window column matrix (findings 1-2 below rule out
  building it in-kernel); each grid step DMAs its TH-row slice at kernel-row
  offset ``i``;
* the kh reduction runs over the innermost grid dimension with the OUTPUT
  block as accumulator (canonical Mosaic K-loop): one MXU dot per step
  against ``w2[i] = [kw*Cin, Cout]``, f32 accumulation;
* the BN/ReLU epilogue runs in-place on the final step — no intermediate
  conv result ever visits HBM.

Scope: stride 1, dilation 1 (the reference trunk's conv2..5); inference
only (BatchNorm folded with running statistics).  Training and strided
layers use the khgemm / lax.conv paths.  Same reference lineage as the
other lowerings: ConvBlock2d semantics, reference model_scalar_1s.py:151-190.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(xc_hbm, w2_ref, s_ref, t_ref, out_ref, cols, sem, *, TH, kh, Wo, K, Cout):
    """Grid = (N, n_tiles, kh): the kernel-row reduction runs over the
    innermost grid dimension with the output block as the accumulator (the
    canonical Mosaic K-loop shape) — no sublane-offset slices or reshapes of
    VMEM values, which earlier formulations tripped on."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    i = pl.program_id(2)

    dma = pltpu.make_async_copy(xc_hbm.at[b, pl.ds(t * TH + i, TH)], cols, sem)
    dma.start()
    dma.wait()

    contrib = jnp.dot(
        cols[...].reshape(TH * Wo, K), w2_ref[0], preferred_element_type=jnp.float32
    ).reshape(TH, Wo, Cout)

    @pl.when(i == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(i > 0)
    def _accum():
        out_ref[0] += contrib

    @pl.when(i == kh - 1)
    def _epilogue():
        out_ref[0] = jnp.maximum(out_ref[0] * s_ref[0] + t_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def conv_block_fused(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: int = 16,
) -> jax.Array:
    """``relu(conv_valid(x, w) * scale + shift)`` — fused inference block.

    :param x: ``[N, H, W, Cin]`` (NHWC)
    :param w: ``[kh, kw, Cin, Cout]`` (HWIO)
    :param scale, shift: ``[Cout]`` folded BN affine (see module docstring)
    :return: ``[N, H-kh+1, W-kw+1, Cout]`` float32
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    K = kw * Cin
    TH = min(tile_rows, Ho)
    n_tiles = -(-Ho // TH)
    # pad rows so every tile (incl. its halo) reads real memory; padded
    # output rows are sliced away at the end
    H_pad = n_tiles * TH + kh - 1
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, H_pad - H), (0, 0), (0, 0)))
    # width-window columns, built by XLA: [N, H_pad, Wo, kw*Cin]; the lane
    # (last) dim is zero-padded to the 128 tiling so the halo DMA slices are
    # aligned (zero columns hit zero weight rows — no numeric effect)
    K_pad = _round_up(K, 128)
    xc = jnp.concatenate([xp[:, :, j : j + Wo, :] for j in range(kw)], axis=-1)
    xc = jnp.pad(xc, ((0, 0), (0, 0), (0, 0), (0, K_pad - K)))

    w2 = w.reshape(kh, K, Cout).astype(jnp.float32)
    w2 = jnp.pad(w2, ((0, 0), (0, K_pad - K), (0, 0)))
    K = K_pad

    from tpumix.utils.backend import is_tpu_backend

    if is_tpu_backend() and os.environ.get("TPUMIX_EXPERIMENTAL_PALLAS_CONV") != "1":
        raise NotImplementedError(
            "conv_block_fused is experimental and currently faults the TPU "
            "worker at production shapes (see module docstring); set "
            "TPUMIX_EXPERIMENTAL_PALLAS_CONV=1 to run it anyway.  Use the "
            "khgemm lowering (tpumix/ops/conv_khgemm.py) in production."
        )

    kernel = functools.partial(_kernel, TH=TH, kh=kh, Wo=Wo, K=K, Cout=Cout)
    out = pl.pallas_call(
        kernel,
        grid=(N, n_tiles, kh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # manual halo DMA source
            pl.BlockSpec((1, K, Cout), lambda b, t, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, t, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, t, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, Wo, Cout), lambda b, t, i: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, n_tiles * TH, Wo, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH, Wo, K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * n_tiles * TH * Wo * kh * K * Cout,
            bytes_accessed=4 * (N * H_pad * Wo * K + kh * K * Cout
                                + N * n_tiles * TH * Wo * Cout),
            transcendentals=0,
        ),
        interpret=not is_tpu_backend(),
    )(xc, w2, scale.reshape(1, Cout).astype(jnp.float32),
      shift.reshape(1, Cout).astype(jnp.float32))
    return out[:, :Ho]


def fold_batchnorm(
    conv_bias: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float,
) -> Tuple[jax.Array, jax.Array]:
    """Inference-time BN fold: ``relu(bn(conv(x)+bias))`` ==
    ``relu(conv(x)*s + t)`` with the returned ``(s, t)``."""
    s = gamma * jax.lax.rsqrt(var + eps)
    t = (conv_bias - mean) * s + beta
    return s, t
