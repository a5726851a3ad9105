"""Fused Pallas TPU kernel: the entire NDT derivative reduction in one pass.

The XLA path (models/registration/ndt.ndt_derivatives) is memory-bound on
TPU: per (point, stencil slot) it gathers an int32 row index from a
multi-MB dense grid, gathers a 64 B packed-stats row, and materializes
[chunk, S, ...] intermediates in HBM between fused ops — measured
~10.5 ms/eval at KITTI scale (32k points x 7 slots) of which ~4 ms is the
two gathers and the rest intermediate traffic (scratch/prof_ndt.py).

This kernel removes both costs:

- The stats fetch is a ONE-HOT SELECTION on the MXU: the occupied-voxel
  table is small (a 20-keyframe local map has ~2-8k valid voxels), so
  `stats = tableT @ (keys == vid)` replaces the gather entirely — no dense
  index grid, no gather instructions. Keys (sorted by flat voxel id) and
  the transposed stats table stay resident in VMEM across all grid steps.
- Point tiles are spatially coherent (clouds come out of the voxel
  downsample in cell order), so each tile's stencil candidates span a
  narrow voxel-id range. The kernel dynamic-slices a fixed-width KEY
  WINDOW around that range (per-tile start precomputed with one
  searchsorted) and compares/contracts only against the window — the
  selection cost scales with the window, not the table. Candidates that
  fall outside the window are counted into an `unresolved` output so
  callers can verify exactness (0 in all measured configurations; widen
  `window` if it ever trips).
- The full Magnusson score/gradient/Hessian math
  (NormalDistributionsTransform.cpp:391-500) runs on the selected [16, T]
  stats while they are still in VMEM, accumulating 28 scalars
  (score, grad[6], upper-triangular Hessian[21]) per tile. HBM traffic per
  evaluation is just the per-point inputs (~4 MB) + tiny partials, instead
  of ~50 MB of gathers and intermediates.

The stencil loop (7 or 27 neighbour offsets) is unrolled inside the kernel
with static offsets, so per-point inputs (position, Jacobian/Hessian rows,
weight) are read once for all slots.

Layouts are TPU-native: all per-point data is [rows, N] (components on
sublanes, points on lanes); per-row ops are [1, T] vectors; the selection
contraction is a [16, W] @ [W, T] f32 matmul per stencil slot.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of the packed per-point input (see models/registration/ndt.py)
_XP = 0  # 0:3 transformed point
_PW = 3  # point weight x valid mask
_JR = 4  # 4:13 rotation Jacobian jrot[r, a] at row 4 + 3*r + a
_HR = 13  # 13:31 q.hrot pairs: row 13 + 3*pair + r, pairs (00,01,02,11,12,22)
_NROWS = 31

# outputs: 0 score, 1:7 grad, 7:28 hessian upper triangle, 28 unresolved
_NOUT = 32
_UNRESOLVED = 28

_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
_UPPER = [(i, j) for i in range(6) for j in range(i, 6)]

# sentinel for unused key rows: sorts above every real voxel id
KEY_SENTINEL = np.int32(2**30)


def _kernel(
    lo_ref,  # [1, G] int32 SMEM: per-tile key-window start (multiple of 128)
    keys_ref,  # [C, 1] int32 sorted flat voxel ids (KEY_SENTINEL pads)
    table_ref,  # [16, C] f32 transposed packed stats (same row order)
    cell_ref,  # [3, T] int32 base voxel coords per point
    rows_ref,  # [_NROWS, T] f32 per-point data
    out_ref,  # [_NOUT, 128] f32 accumulated sums (column 0)
    *,
    dims: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    window: int,
    d1: float,
    d2: float,
    res2: float,
    gate_radius: bool,
    weight_derivatives: bool,
):
    t = cell_ref.shape[1]
    i = pl.program_id(0)

    start = pl.multiple_of(lo_ref[0, i], 128)
    kw = keys_ref[pl.ds(start, window), :]  # [W, 1]
    tw = table_ref[:, pl.ds(start, window)]  # [16, W]
    # keys are sorted, so the window's value range is [min, max]
    kfirst = jnp.min(kw)
    klast = jnp.max(kw)

    cx = cell_ref[0:1, :]
    cy = cell_ref[1:2, :]
    cz = cell_ref[2:3, :]
    xp0 = rows_ref[_XP : _XP + 1, :]
    xp1 = rows_ref[_XP + 1 : _XP + 2, :]
    xp2 = rows_ref[_XP + 2 : _XP + 3, :]
    pw = rows_ref[_PW : _PW + 1, :]

    def jr(r, a):
        k = _JR + 3 * r + a
        return rows_ref[k : k + 1, :]

    def hr(pair, r):
        k = _HR + 3 * pair + r
        return rows_ref[k : k + 1, :]

    acc = [jnp.zeros((1, t), jnp.float32) for _ in range(_NOUT)]

    for (ox, oy, oz) in offsets:
        nx = cx + ox
        ny = cy + oy
        nz = cz + oz
        inb = (
            (nx >= 0)
            & (nx < dims[0])
            & (ny >= 0)
            & (ny < dims[1])
            & (nz >= 0)
            & (nz < dims[2])
        )
        vid = (nx * dims[1] + ny) * dims[2] + nz
        vid = jnp.where(inb, vid, -2)  # [1, T]; -2 never matches a key

        # exactness guard: an in-bounds candidate ABOVE the window's value
        # range might exist in unloaded keys — count it (callers check == 0).
        # The lower side needs no guard: the wrapper anchors the window with
        # searchsorted(keys, per-tile candidate minimum), so every key below
        # kfirst is provably below every candidate of this tile.
        acc[_UNRESOLVED] = acc[_UNRESOLVED] + (inb & (vid > klast)).astype(jnp.float32)

        onehot = (kw == vid).astype(jnp.float32)  # [W, T]
        stats = jnp.dot(tw, onehot, preferred_element_type=jnp.float32)  # [16, T]

        mu0 = stats[0:1, :]
        mu1 = stats[1:2, :]
        mu2 = stats[2:3, :]
        sv = stats[3:4, :]
        ixx = stats[4:5, :]
        ixy = stats[5:6, :]
        ixz = stats[6:7, :]
        iyy = stats[7:8, :]
        iyz = stats[8:9, :]
        izz = stats[9:10, :]
        vvalid = stats[10:11, :]

        e0 = xp0 - mu0
        e1 = xp1 - mu1
        e2 = xp2 - mu2
        q0 = ixx * e0 + ixy * e1 + ixz * e2
        q1 = ixy * e0 + iyy * e1 + iyz * e2
        q2 = ixz * e0 + iyz * e1 + izz * e2
        md = q0 * e0 + q1 * e1 + q2 * e2
        expt = jnp.exp(jnp.float32(-0.5 * d2) * md)
        exd = jnp.float32(d2) * expt
        # isfinite matches the XLA path's guard (updateDerivatives clamps
        # d2*exp in [0, 1], cpp:494-500); zeroing expt under the gate keeps a
        # NaN from a non-finite input point out of the 0*NaN accumulation
        gate = (vvalid > 0.5) & (exd <= 1.0) & (exd >= 0.0) & jnp.isfinite(exd)
        if gate_radius:
            gate = gate & (e0 * e0 + e1 * e1 + e2 * e2 <= res2)
        gf = gate.astype(jnp.float32)
        expt = jnp.where(gate, expt, 0.0)

        # score term: gf * sv * pw * (-d1) * expt  (updateDerivatives,
        # NormalDistributionsTransform.cpp:436-441 with the voxel weight)
        acc[0] = acc[0] + gf * sv * pw * jnp.float32(-d1) * expt
        dw = sv * pw if weight_derivatives else pw
        f = gf * dw * jnp.float32(d1 * d2) * expt

        # qJ columns: p < 3 -> q_p; p = 3+a -> sum_r q_r * jrot[r, a]
        q = (q0, q1, q2)
        qj = [q0, q1, q2]
        for a in range(3):
            qj.append(q0 * jr(0, a) + q1 * jr(1, a) + q2 * jr(2, a))

        for p in range(6):
            acc[1 + p] = acc[1 + p] + f * qj[p]

        # cj[r, a] = (Cinv jrot_a)[r]
        ci = ((ixx, ixy, ixz), (ixy, iyy, iyz), (ixz, iyz, izz))
        cj = [[None] * 3 for _ in range(3)]
        for r in range(3):
            for a in range(3):
                cj[r][a] = ci[r][0] * jr(0, a) + ci[r][1] * jr(1, a) + ci[r][2] * jr(2, a)

        pair_idx = {p: k for k, p in enumerate(_PAIRS)}
        for u, (ii, jj) in enumerate(_UPPER):
            # h1 = -d2 f qJ_i qJ_j
            term = jnp.float32(-d2) * f * qj[ii] * qj[jj]
            # h3 = f (J^T Cinv J)[i, j]
            if ii < 3 and jj < 3:
                term = term + f * ci[ii][jj]
            elif ii < 3:
                term = term + f * cj[ii][jj - 3]
            else:
                a, b = ii - 3, jj - 3
                term = term + f * (
                    jr(0, a) * cj[0][b] + jr(1, a) * cj[1][b] + jr(2, a) * cj[2][b]
                )
                # h2 = f q . hrot[a, b, :]
                pk = pair_idx[(a, b) if a <= b else (b, a)]
                term = term + f * (q[0] * hr(pk, 0) + q[1] * hr(pk, 1) + q[2] * hr(pk, 2))
            acc[7 + u] = acc[7 + u] + term

    # single resident [32, 128] accumulator block (TPU wants last dim 128);
    # zero it on the first step, then accumulate per-step sums in column 0
    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    for k in range(_NOUT):
        out_ref[k : k + 1, 0:1] = out_ref[k : k + 1, 0:1] + jnp.sum(
            acc[k], axis=1, keepdims=True
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "offsets",
        "d1",
        "d2",
        "res2",
        "gate_radius",
        "weight_derivatives",
        "tile",
        "window",
        "interpret",
    ),
)
def ndt_reduce_fused(
    lo,  # [G] int32 per-tile key-window starts (multiples of 128)
    keys,  # [C] int32 sorted (KEY_SENTINEL padding); C multiple of 128
    table_t,  # [16, C] f32
    cell,  # [3, N] int32 (N multiple of tile)
    rows,  # [_NROWS, N] f32
    dims: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    d1: float,
    d2: float,
    res2: float,
    gate_radius: bool,
    weight_derivatives: bool,
    tile: int = 256,
    window: int = 2048,
    interpret: bool = False,
):
    """Returns [32]: score, grad[6], hess upper[21], unresolved count, pad."""
    c = keys.shape[0]
    n = cell.shape[1]
    window = min(window, c)
    assert c % 128 == 0 and n % tile == 0
    grid = (n // tile,)

    kern = functools.partial(
        _kernel,
        dims=dims,
        offsets=offsets,
        window=window,
        d1=d1,
        d2=d2,
        res2=res2,
        gate_radius=gate_radius,
        weight_derivatives=weight_derivatives,
    )
    partials = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NROWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_NOUT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_NOUT, 128), jnp.float32),
        interpret=interpret,
    )(lo.reshape(1, -1), keys.reshape(c, 1), table_t, cell, rows)
    return partials[:, 0]


def unpack_results(sums):
    """[32] partials -> (score, grad [6], hess [6, 6], unresolved)."""
    score = sums[0]
    grad = sums[1:7]
    hess = jnp.zeros((6, 6), jnp.float32)
    for u, (i, j) in enumerate(_UPPER):
        hess = hess.at[i, j].set(sums[7 + u])
        if i != j:
            hess = hess.at[j, i].set(sums[7 + u])
    return score, grad, hess, sums[_UNRESOLVED]
