"""Fused Pallas conv-block kernel: VALID conv + folded BatchNorm + ReLU in
one VMEM-resident pass over MXU-aligned tiles.

Why: under XLA the khgemm lowering (tpumix/ops/conv_khgemm.py) materialises a
``part`` buffer of ``kh x`` the layer output in HBM (the kh-unrolled GEMM
result) and crosses fusion boundaries for the kh-reduction and the BN/ReLU
epilogue — for the 128-channel conv5 (55 % of trunk FLOPs, reference
model_scalar_1s.py:215) that is ~9 GB of HBM round trip per 64-chunk segment.
This kernel computes

    y = relu( conv_valid(x, w) * scale + shift )

(``scale``/``shift`` are the inference-time BN fold, :func:`fold_batchnorm`)
with NO intermediate ever visiting HBM: each grid step holds one row-tile of
the input in VMEM, runs one MXU dot per kernel row against ``w2[i]``, and
applies the epilogue in place.

Round-3 design (the round-2 kernel faulted the TPU worker; four earlier
formulations are catalogued in git history): every construct the faulting
variants shared is GONE —

* **no manual DMA** — the halo problem is solved OUTSIDE the kernel: XLA
  prebuilds overlapping row-tiles (``xt[g] = rows [t*TH, t*TH+TH+kh-1)`` of
  the width-window column matrix) so standard disjoint BlockSpecs suffice;
* **no in-kernel reshape** — tiles are prebuilt FLAT as ``[R*Wop, Kp]`` with
  ``Wop`` a sublane multiple (8 for f32), so the per-kernel-row operand is a
  static sublane-offset slice ``x[i*Wop : i*Wop + TH*Wop]`` (offset always a
  multiple of 8) feeding a plain 2-D ``jnp.dot``;
* **no in-kernel concatenate** — the width windows are part of the same XLA
  prebuild (lane dim zero-padded to the 128 tiling; zero columns meet zero
  weight rows).

Cost model (why this shape): one dot per kernel row keeps the MXU output
dimension at ``Cout`` — a full 128 lanes for conv5, which is where the FLOPs
are; narrow layers (32/48 channels) underfill the MXU this way and stay on
the khgemm lowering, whose ``kh*Cout`` output packing fills lanes better.
The model-level dispatch (``conv_impl="pallas"``, tpumix/models/blocks.py)
routes each block to whichever lowering measures faster.

Scope: stride 1, dilation 1 (the reference trunk's conv2..5); inference only
(BatchNorm folded with running statistics); float32 (the conformance dtype).
Training and strided/dilated layers use the khgemm / lax.conv paths.
Reference lineage: ConvBlock2d semantics, model_scalar_1s.py:151-190.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget for tile sizing (per-core VMEM is ~16 MB; leave
# headroom for Mosaic's own buffers and the double-buffered pipeline)
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024

# HBM budget for the haloed-tile prebuild.  A 64-chunk Scalar2s segment's
# conv5 would otherwise materialise ~8 GB of xt next to the other layers'
# intermediates and blow the 15.75 GB HBM (observed in round 3): batches
# beyond the budget run through lax.map groups, bounding peak HBM at the
# cost of serialising group prebuilds.
_XT_BUDGET_BYTES = 2 * 1024 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_tile_rows(Ho: int, kh: int, Wop: int, Kp: int, Cout: int) -> int:
    """Largest row-tile whose double-buffered working set fits the budget."""
    lanes_out = _round_up(Cout, 128)
    for th in (64, 48, 32, 24, 16, 8):
        r = th + kh - 1
        need = (
            2 * (r * Wop * Kp) * 4  # input tile, double buffered
            + kh * Kp * lanes_out * 4  # w2 (lanes pad to 128)
            + 2 * (th * Wop * lanes_out) * 4  # output tile, double buffered
            + (th * Wop * lanes_out) * 4  # accumulator value
        )
        if need <= _VMEM_BUDGET_BYTES:
            return min(th, _round_up(Ho, 8))
    return 8


def _use_patches_cols() -> bool:
    """Build the width-window columns with lax.conv_general_dilated_patches
    (a grouped identity conv — moves the narrow-channel interleave onto the
    conv engine) instead of a shifted-slice concat.  The concat assembles
    rows from Cin-float (64-byte for conv2) chunks, which the plain copy
    path executes far below HBM bandwidth."""
    import os

    return os.environ.get("TPUMIX_PATCHES_COLS", "1") != "0"


def _flat_halo_tiles(
    xg_batch: jax.Array,
    *,
    H: int,
    W: int,
    kh: int,
    kw: int,
    TH: int,
    n_tiles: int,
    R: int,
    Wop: int,
    K: int,
    Kp: int,
    patches: bool,
) -> jax.Array:
    """XLA prebuild shared by both kernel variants: flat haloed row-tiles of
    the width-window column matrix.  Lane order depends on the builder —
    ``patches=False``: tap-major, ``xt[.., j*Cin + c] = xp[n, ., w + j, c]``;
    ``patches=True``: channel-major, ``xt[.., c*kw + j]`` (the
    conv_general_dilated_patches layout).  Weight matrices must be packed in
    the matching order (see the callers)."""
    n = xg_batch.shape[0]
    xf = xg_batch.astype(jnp.float32)
    # width pad so every window slice j:j+Wop is in range (garbage columns
    # at w >= Wo read zeros and are cropped after the kernel); row pad so
    # the last tile + halo reads real memory
    xp = jnp.pad(
        xf, ((0, 0), (0, n_tiles * TH + kh - 1 - H), (0, Wop + kw - 1 - W), (0, 0))
    )
    if patches:
        cols_full = jax.lax.conv_general_dilated_patches(
            xp,
            filter_shape=(1, kw),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [n, H_pad, Wop, Cin*kw] channel-major lanes
        cols_full = jnp.pad(cols_full, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
        xg = jnp.stack(
            [cols_full[:, t * TH : t * TH + R] for t in range(n_tiles)], axis=1
        )  # [n, n_tiles, R, Wop, Kp]
        return xg.reshape(n * n_tiles, R * Wop, Kp)
    # STATIC slices, not an index-array gather: XLA lowers these to dense
    # copies, while a gather runs an order of magnitude slower on TPU
    xg = jnp.stack(
        [xp[:, t * TH : t * TH + R] for t in range(n_tiles)], axis=1
    )  # [n, n_tiles, R, Wp, Cin]
    cols = jnp.concatenate(
        [xg[:, :, :, j : j + Wop, :] for j in range(kw)], axis=-1
    )  # [n, n_tiles, R, Wop, K]
    cols = jnp.pad(cols, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Kp - K)))
    return cols.reshape(n * n_tiles, R * Wop, Kp)


def _kernel(xt_ref, w2_ref, s_ref, t_ref, out_ref, *, TH: int, kh: int, Wop: int):
    """One row-tile: kh MXU dots (static sublane-offset slices of the flat
    tile) accumulated in f32, then the folded-BN + ReLU epilogue in place."""
    x = xt_ref[0]  # [R*Wop, Kp]
    acc = jnp.dot(x[0 : TH * Wop, :], w2_ref[0], preferred_element_type=jnp.float32)
    for i in range(1, kh):
        acc = acc + jnp.dot(
            x[i * Wop : i * Wop + TH * Wop, :],
            w2_ref[i],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = jnp.maximum(acc * s_ref[0] + t_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret", "patches"))
def conv_block_fused(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
    patches: Optional[bool] = None,
) -> jax.Array:
    """``relu(conv_valid(x, w) * scale + shift)`` — fused inference block.

    :param x: ``[N, H, W, Cin]`` (NHWC)
    :param w: ``[kh, kw, Cin, Cout]`` (HWIO), stride 1 / dilation 1
    :param scale, shift: ``[Cout]`` folded BN affine (:func:`fold_batchnorm`)
    :param tile_rows: output rows per grid step (default: largest that fits
        the VMEM budget)
    :param interpret: force Pallas interpreter mode (default: interpret
        everywhere except real TPU backends)
    :return: ``[N, H-kh+1, W-kw+1, Cout]`` float32
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    Wop = _round_up(Wo, 8)  # sublane multiple -> flat-tile slices stay aligned
    K = kw * Cin
    Kp = _round_up(K, 128)  # lane multiple -> one zero-padded lane group
    TH = tile_rows or _pick_tile_rows(Ho, kh, Wop, Kp, Cout)
    n_tiles = -(-Ho // TH)
    R = TH + kh - 1  # rows per tile incl. halo

    if interpret is None:
        from tpumix.utils.backend import is_tpu_backend

        interpret = not is_tpu_backend()

    if patches is None:
        patches = _use_patches_cols()
    # weights: [kh, kw, Cin, Cout] -> [kh, kw*Cin, Cout]; contraction lane
    # order must match the cols builder (tap-major j*Cin+c for the concat
    # build, channel-major c*kw+j for the patches build)
    if patches:
        w2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(kh, K, Cout).astype(jnp.float32)
    else:
        w2 = w.reshape(kh, K, Cout).astype(jnp.float32)
    w2 = jnp.pad(w2, ((0, 0), (0, Kp - K), (0, 0)))
    s2 = scale.reshape(1, Cout).astype(jnp.float32)
    t2 = shift.reshape(1, Cout).astype(jnp.float32)
    kernel = functools.partial(_kernel, TH=TH, kh=kh, Wop=Wop)

    def _core(xg_batch: jax.Array) -> jax.Array:
        n = xg_batch.shape[0]
        xt = _flat_halo_tiles(
            xg_batch, H=H, W=W, kh=kh, kw=kw, TH=TH, n_tiles=n_tiles, R=R,
            Wop=Wop, K=K, Kp=Kp, patches=patches,
        )

        out = pl.pallas_call(
            kernel,
            grid=(n * n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, R * Wop, Kp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((kh, Kp, Cout), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Cout), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Cout), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TH * Wop, Cout), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n * n_tiles, TH * Wop, Cout), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * n_tiles * TH * Wop * kh * Kp * Cout,
                bytes_accessed=4
                * (
                    n * n_tiles * R * Wop * Kp
                    + kh * Kp * Cout
                    + n * n_tiles * TH * Wop * Cout
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(xt, w2, s2, t2)
        return out.reshape(n, n_tiles * TH, Wop, Cout)[:, :Ho, :Wo, :]

    # bound the prebuild's HBM footprint: run oversize batches in lax.map
    # groups (sequential, each with its own bounded xt)
    per_n = n_tiles * R * Wop * Kp * 4
    group = max(1, min(N, _XT_BUDGET_BYTES // max(per_n, 1)))
    if group >= N:
        return _core(x)
    n_groups = -(-N // group)
    xpad = jnp.pad(x, ((0, n_groups * group - N), (0, 0), (0, 0), (0, 0)))
    y = jax.lax.map(_core, xpad.reshape(n_groups, group, H, W, Cin))
    return y.reshape(n_groups * group, Ho, Wo, Cout)[:N]


# ---------------------------------------------------------------------------
# v2 kernels: two-adjacent-block tiles, NO halo materialisation.
#
# The v1 kernels above read pre-haloed tiles, which duplicates (TH+kh-1)/TH
# of the width-window matrix in HBM and forces lax.map batch grouping to
# bound peak memory.  v2 instead gives the kernel TWO disjoint blocks of the
# same flat tile array — tile t ("A") and tile t+1 ("B") — and resolves the
# kernel-row shifts across the seam with ragged aligned slices into a VMEM
# accumulator.  The prebuild then collapses to width-window columns + row
# pad + a free reshape: nothing is ever duplicated in HBM.
# ---------------------------------------------------------------------------


def _flat_tiles_nohalo(
    xg_batch: jax.Array,
    *,
    H: int,
    W: int,
    kh: int,
    kw: int,
    TH: int,
    n_tiles: int,
    Wop: int,
    K: int,
    Kp: int,
    patches: bool,
) -> jax.Array:
    """Disjoint flat row-tiles of the width-window column matrix, with one
    extra all-zero tile per batch item so tile t+1 ("B") of the last tile
    reads the item's own padding, never the next item."""
    n = xg_batch.shape[0]
    xf = xg_batch.astype(jnp.float32)
    H_pad = (n_tiles + 1) * TH
    xp = jnp.pad(xf, ((0, 0), (0, H_pad - H), (0, Wop + kw - 1 - W), (0, 0)))
    if patches:
        cols = jax.lax.conv_general_dilated_patches(
            xp,
            filter_shape=(1, kw),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [n, H_pad, Wop, Cin*kw] channel-major lanes
    else:
        cols = jnp.concatenate(
            [xp[:, :, j : j + Wop, :] for j in range(kw)], axis=-1
        )  # [n, H_pad, Wop, K] tap-major lanes
    cols = jnp.pad(cols, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
    return cols.reshape(n * (n_tiles + 1), TH * Wop, Kp)


def _pick_tile_rows_v2(Ho: int, kh: int, Wop: int, Kp: int, Cout: int) -> int:
    lanes_out = _round_up(Cout, 128)
    for th in (32, 24, 16, 8):
        m = th * Wop
        need = (
            4 * (m * Kp) * 4  # A and B blocks, double buffered
            + kh * Kp * lanes_out * 4  # w2
            + (m * lanes_out) * 4  # accumulator scratch
            + 2 * (m * lanes_out) * 4  # output, double buffered
        )
        if need <= _VMEM_BUDGET_BYTES:
            return min(th, _round_up(Ho, 8))
    return 8


def _kernel2(a_ref, b_ref, w2_ref, s_ref, t_ref, out_ref, acc, *, TH, kh, Wop):
    """Per-kernel-row dots with the row shift resolved across the A|B seam:
    output rows [0, M-i*Wop) read A at row offset i*Wop, the last i*Wop rows
    read the head of B.  All slice offsets are multiples of Wop (itself a
    multiple of 8), all dots are 2-D."""
    M = TH * Wop
    a = a_ref[0]
    acc[...] = jnp.dot(a, w2_ref[0], preferred_element_type=jnp.float32)
    for i in range(1, kh):
        sh = i * Wop
        if sh < M:  # Mosaic rejects zero-size vectors; sh == M means the
            # whole shifted range comes from B
            acc[0 : M - sh, :] += jnp.dot(
                a[sh:M, :], w2_ref[i], preferred_element_type=jnp.float32
            )
        acc[M - sh : M, :] += jnp.dot(
            b_ref[0][0:sh, :], w2_ref[i], preferred_element_type=jnp.float32
        )
    out_ref[0] = jnp.maximum(acc[...] * s_ref[0] + t_ref[0], 0.0)


def _kernel_khpack2(
    a_ref, b_ref, w2_ref, s_ref, t_ref, out_ref, acc, *, TH, kh, Wop, Cout
):
    """khgemm-packed variant of :func:`_kernel2`: one wide dot per block
    (output dim ``kh*Cout``), lane realignment by one pltpu.roll per distinct
    ``(i*Cout) % 128`` class, seam rows served from the head of B's part."""
    M = TH * Wop
    hb = (kh - 1) * Wop
    part_a = jnp.dot(a_ref[0], w2_ref[...], preferred_element_type=jnp.float32)
    part_b = (
        jnp.dot(b_ref[0][0:hb, :], w2_ref[...], preferred_element_type=jnp.float32)
        if hb
        else None
    )
    first = True
    for off in sorted({(i * Cout) % 128 for i in range(kh)}):
        src_a = part_a if off == 0 else pltpu.roll(part_a, kh * Cout - off, axis=1)
        src_b = None
        if part_b is not None:
            src_b = part_b if off == 0 else pltpu.roll(part_b, kh * Cout - off, axis=1)
        for i in range(kh):
            if (i * Cout) % 128 != off:
                continue
            base = i * Cout - off
            sh = i * Wop
            if first:
                # i == 0 is always in offset class 0 and comes first
                acc[...] = src_a[:, base : base + Cout]
                first = False
                continue
            if sh < M:  # zero-size vectors are invalid in Mosaic
                acc[0 : M - sh, :] += src_a[sh:M, base : base + Cout]
            acc[M - sh : M, :] += src_b[0:sh, base : base + Cout]
    out_ref[0] = jnp.maximum(acc[...] * s_ref[0] + t_ref[0], 0.0)


def _conv_block_fused_v2(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: Optional[int],
    interpret: Optional[bool],
    khpack: bool,
    patches: Optional[bool] = None,
) -> jax.Array:
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    Wop = _round_up(Wo, 8)
    K = kw * Cin
    Kp = _round_up(K, 128)
    if khpack:
        TH = tile_rows or _pick_tile_rows_khpack(Ho, kh, Wop, Kp, Cout)
    else:
        TH = tile_rows or _pick_tile_rows_v2(Ho, kh, Wop, Kp, Cout)
    if TH < kh - 1:
        raise ValueError(
            f"tile_rows={TH} < kh-1={kh - 1}: a shifted row range would span "
            "more than two tiles"
        )
    n_tiles = -(-Ho // TH)
    M = TH * Wop

    if interpret is None:
        from tpumix.utils.backend import is_tpu_backend

        interpret = not is_tpu_backend()

    if patches is None:
        patches = _use_patches_cols()
    if khpack:
        if patches:
            w2 = jnp.transpose(w, (2, 1, 0, 3)).reshape(K, kh * Cout)
        else:
            w2 = jnp.transpose(w, (1, 2, 0, 3)).reshape(K, kh * Cout)
        w2 = jnp.pad(w2.astype(jnp.float32), ((0, Kp - K), (0, 0)))
        w2_spec = pl.BlockSpec((Kp, kh * Cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_kernel_khpack2, TH=TH, kh=kh, Wop=Wop, Cout=Cout)
    else:
        if patches:
            w2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(kh, K, Cout)
        else:
            w2 = w.reshape(kh, K, Cout)
        w2 = jnp.pad(w2.astype(jnp.float32), ((0, 0), (0, Kp - K), (0, 0)))
        w2_spec = pl.BlockSpec((kh, Kp, Cout), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_kernel2, TH=TH, kh=kh, Wop=Wop)

    xt = _flat_tiles_nohalo(
        x, H=H, W=W, kh=kh, kw=kw, TH=TH, n_tiles=n_tiles, Wop=Wop, K=K, Kp=Kp,
        patches=patches,
    )  # [(N*(n_tiles+1)), M, Kp]

    nt1 = n_tiles + 1
    out = pl.pallas_call(
        kernel,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, M, Kp), lambda n, t: (n * nt1 + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Kp), lambda n, t: (n * nt1 + t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            w2_spec,
            pl.BlockSpec((1, Cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, M, Cout), lambda n, t: (n * n_tiles + t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N * n_tiles, M, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, Cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * n_tiles * M * kh * Kp * Cout,
            bytes_accessed=4 * (2 * N * n_tiles * M * Kp + kh * Kp * Cout
                                + N * n_tiles * M * Cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xt,
        xt,
        w2,
        scale.reshape(1, Cout).astype(jnp.float32),
        shift.reshape(1, Cout).astype(jnp.float32),
    )
    return out.reshape(N, n_tiles * TH, Wop, Cout)[:, :Ho, :Wo, :]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret", "patches"))
def conv_block_fused_v2(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
    patches: Optional[bool] = None,
) -> jax.Array:
    """Two-block (no halo materialisation) per-kernel-row-dot fused block;
    same contract as :func:`conv_block_fused`."""
    return _conv_block_fused_v2(x, w, scale, shift, tile_rows, interpret,
                                khpack=False, patches=patches)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret", "patches"))
def conv_block_fused_khpack_v2(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
    patches: Optional[bool] = None,
) -> jax.Array:
    """Two-block (no halo materialisation) khgemm-packed fused block; same
    contract as :func:`conv_block_fused_khpack`."""
    return _conv_block_fused_v2(x, w, scale, shift, tile_rows, interpret,
                                khpack=True, patches=patches)


def _pick_tile_rows_khpack(Ho: int, kh: int, Wop: int, Kp: int, Cout: int) -> int:
    """Row-tile for the khgemm-packed variant: the full ``part`` matrix
    (``R*Wop x kh*Cout``) plus one live roll must fit next to the pipeline
    buffers."""
    lanes_part = _round_up(kh * Cout, 128)
    lanes_out = _round_up(Cout, 128)
    for th in (48, 32, 24, 16, 8):
        r = th + kh - 1
        need = (
            2 * (r * Wop * Kp) * 4  # input tile, double buffered
            + Kp * lanes_part * 4  # w2 packed
            + 2 * (r * Wop * lanes_part) * 4  # part + one live rolled copy
            + 2 * (th * Wop * lanes_out) * 4  # output tile, double buffered
        )
        if need <= _VMEM_BUDGET_BYTES:
            return min(th, _round_up(Ho, 8))
    return 8


def _kernel_khpack(
    xt_ref, w2_ref, s_ref, t_ref, out_ref, *, TH: int, kh: int, Wop: int, Cout: int
):
    """khgemm-packed tile: ONE MXU dot with output dimension ``kh*Cout``
    (fills the 128 lanes the narrow reference layers leave idle — same idea
    as tpumix/ops/conv_khgemm.py, but the ``part`` matrix lives in VMEM
    instead of HBM), then the kh shifted-add reduction on the VPU.  Lane
    alignment: slices must start at 128-multiples, so kernel rows are grouped
    by ``(i*Cout) % 128`` and each distinct offset class is realigned with a
    single ``pltpu.roll`` of ``part``."""
    part = jnp.dot(
        xt_ref[0], w2_ref[...], preferred_element_type=jnp.float32
    )  # [R*Wop, kh*Cout]
    acc = None
    for off in sorted({(i * Cout) % 128 for i in range(kh)}):
        # realign lanes: rolled[l] = part[l + off]  (shift must be
        # non-negative, so rotate by width - off)
        src = part if off == 0 else pltpu.roll(part, kh * Cout - off, axis=1)
        for i in range(kh):
            if (i * Cout) % 128 != off:
                continue
            base = i * Cout - off  # multiple of 128 by construction
            sl = src[i * Wop : i * Wop + TH * Wop, base : base + Cout]
            acc = sl if acc is None else acc + sl
    out_ref[0] = jnp.maximum(acc * s_ref[0] + t_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret", "patches"))
def conv_block_fused_khpack(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    tile_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
    patches: Optional[bool] = None,
) -> jax.Array:
    """``relu(conv_valid(x, w) * scale + shift)`` for NARROW layers
    (``Cout < 128``): khgemm lane packing with the ``part`` matrix kept in
    VMEM.  Same contract as :func:`conv_block_fused`."""
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    Wop = _round_up(Wo, 8)
    K = kw * Cin
    Kp = _round_up(K, 128)
    TH = tile_rows or _pick_tile_rows_khpack(Ho, kh, Wop, Kp, Cout)
    n_tiles = -(-Ho // TH)
    R = TH + kh - 1

    if interpret is None:
        from tpumix.utils.backend import is_tpu_backend

        interpret = not is_tpu_backend()

    if patches is None:
        patches = _use_patches_cols()
    # [kh, kw, Cin, Cout] -> [kw*Cin, kh*Cout]: row order matches the cols
    # builder (tap-major or channel-major); column index i*Cout+o is the
    # packed part layout
    if patches:
        w2 = jnp.transpose(w, (2, 1, 0, 3)).reshape(K, kh * Cout).astype(jnp.float32)
    else:
        w2 = jnp.transpose(w, (1, 2, 0, 3)).reshape(K, kh * Cout).astype(jnp.float32)
    w2 = jnp.pad(w2, ((0, Kp - K), (0, 0)))
    s2 = scale.reshape(1, Cout).astype(jnp.float32)
    t2 = shift.reshape(1, Cout).astype(jnp.float32)
    kernel = functools.partial(_kernel_khpack, TH=TH, kh=kh, Wop=Wop, Cout=Cout)

    def _core(xg_batch: jax.Array) -> jax.Array:
        n = xg_batch.shape[0]
        xt = _flat_halo_tiles(
            xg_batch, H=H, W=W, kh=kh, kw=kw, TH=TH, n_tiles=n_tiles, R=R,
            Wop=Wop, K=K, Kp=Kp, patches=patches,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n * n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, R * Wop, Kp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((Kp, kh * Cout), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Cout), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Cout), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TH * Wop, Cout), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n * n_tiles, TH * Wop, Cout), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * n_tiles * R * Wop * Kp * kh * Cout,
                bytes_accessed=4
                * (
                    n * n_tiles * R * Wop * Kp
                    + Kp * kh * Cout
                    + n * n_tiles * TH * Wop * Cout
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(xt, w2, s2, t2)
        return out.reshape(n, n_tiles * TH, Wop, Cout)[:, :Ho, :Wo, :]

    per_n = n_tiles * R * Wop * Kp * 4
    group = max(1, min(N, _XT_BUDGET_BYTES // max(per_n, 1)))
    if group >= N:
        return _core(x)
    n_groups = -(-N // group)
    xpad = jnp.pad(x, ((0, n_groups * group - N), (0, 0), (0, 0), (0, 0)))
    y = jax.lax.map(_core, xpad.reshape(n_groups, group, H, W, Cin))
    return y.reshape(n_groups * group, Ho, Wo, Cout)[:N]


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
