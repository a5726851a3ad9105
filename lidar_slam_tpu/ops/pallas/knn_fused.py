"""Fused Pallas TPU kernel: windowed brute-force k-NN over a bucket grid.

The XLA `ops.hashgrid.knn_query` is gather-bound on TPU: per query it
gathers 27 stencil cells x bucket_k candidate rows (~432 point gathers),
measured 162 ms for 32k queries against a 131k-capacity map — the A-LOAM
mapping stage spends ~90% of its time there.

This kernel exploits the same structure as ops/pallas/ndt_fused.py:

- The bucket grid's point table is ALREADY sorted by flat cell id
  (build_bucket_grid sorts once per map build), so all candidates within
  the 3x3x3 stencil of a query live in ONE contiguous row range of the
  table (the +-1 x-slab band). Queries sorted by cell id give tiles whose
  bands are narrow.
- The whole feature table ([F, N] transposed: xyz, validity, original
  index, optional attributes like ring id) stays RESIDENT in VMEM; each
  tile dynamic-slices a fixed-width column window around its band.
- Distances are three broadcasted [T, W] squares on the VPU (numerically
  direct — no |q|^2 expansion, so world-frame coordinates keep full f32
  precision); top-k is k rounds of row-min + one-hot extraction, where the
  extraction is an MXU contraction that returns the neighbour's full
  FEATURE row — consumers (line/plane fits) need no follow-up gather.
- Exactness: the wrapper computes each tile's needed column range exactly
  from the grid's CSR offsets; candidates falling outside the window are
  counted into an `unresolved` output (0 in all measured configurations).
  Unlike the XLA path there is NO bucket_k truncation — this path is exact
  gated k-NN whenever unresolved == 0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.hashgrid import BucketGrid, _flat_cell_id

_BIG = 1e30


def _kernel(
    lo_ref,  # [1, G] int32 SMEM window starts (multiples of 128)
    tgt_ref,  # [F, N] f32 rows: x, y, z, valid, idx, extras..., pad
    q_ref,  # [T, 8] f32 cols: x, y, z, valid
    out_ref,  # [T, k*(F+1)] f32: per rank j, F feature cols + d2
    *,
    k: int,
    window: int,
    max_r2: float,
):
    f = tgt_ref.shape[0]
    t = q_ref.shape[0]
    i = pl.program_id(0)

    start = pl.multiple_of(lo_ref[0, i], 128)
    win = tgt_ref[:, pl.ds(start, window)]  # [F, W]

    dx = q_ref[:, 0:1] - win[0:1, :]  # [T, W]
    dy = q_ref[:, 1:2] - win[1:2, :]
    dz = q_ref[:, 2:3] - win[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz

    ok = (win[3:4, :] > 0.5) & (q_ref[:, 3:4] > 0.5) & (d2 <= max_r2)
    d2m = jnp.where(ok, d2, _BIG)
    # deterministic tie-break on the integer column index: exactly-tied
    # distances (duplicate / symmetric map points) must yield a ONE-hot row,
    # or the MXU contraction below returns the SUM of the tied feature rows.
    # An f32 epsilon perturbation is below one ulp for d2 >~ 0.02 and fails.
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, window), 1)
    big_i = jnp.int32(2**30)

    for j in range(k):
        m = jnp.min(d2m, axis=1, keepdims=True)  # [T, 1]
        found = m < _BIG
        ismin = (d2m == m) & found  # [T, W] possibly multi-hot on ties
        jmin = jnp.min(jnp.where(ismin, iota, big_i), axis=1, keepdims=True)
        onehot = (ismin & (iota == jmin)).astype(jnp.float32)  # [T, W] one-hot
        feats = jax.lax.dot_general(
            onehot, win, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [T, F]
        out_ref[:, j * (f + 1) : j * (f + 1) + f] = feats
        out_ref[:, j * (f + 1) + f : (j + 1) * (f + 1)] = jnp.where(found, m, _BIG)
        # eliminate ONLY the selected column; a second tied candidate stays
        # available and becomes rank j+1
        d2m = jnp.where(onehot > 0.0, _BIG, d2m)


@functools.partial(
    jax.jit, static_argnames=("k", "window", "tile", "max_r2", "interpret")
)
def _knn_call(lo, tgt_t, qpacked, k, window, tile, max_r2, interpret):
    f, n_t = tgt_t.shape
    nq = qpacked.shape[0]
    grid = (nq // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, window=window, max_r2=max_r2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((f, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, k * (f + 1)), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, k * (f + 1)), jnp.float32),
        interpret=interpret,
    )(lo.reshape(1, -1), tgt_t, qpacked)
    return out


def window_knn(
    grid: BucketGrid,
    queries,  # [Q, 3]
    query_mask,  # [Q] bool (invalid queries return no neighbours)
    k: int,
    max_radius: float,
    extras=None,  # optional [N_target] or [N_target, E] per-point attributes
    window: int = 2048,
    tile: int = 128,
    interpret: bool = False,
):
    """Exact gated k-NN with neighbour features returned in-kernel.

    Queries should be sorted by grid cell for narrow windows (the result is
    exact for ANY order as long as `unresolved` == 0; callers sort for
    performance, the guard catches insufficiency).

    Returns dict with:
      idx [Q, k] int32 original-cloud indices (0 where invalid),
      dist [Q, k] f32 (inf where invalid), ok [Q, k] bool,
      pts [Q, k, 3] neighbour coordinates,
      extras [Q, k, E] (when extras given),
      unresolved [] f32 — candidate rows provably needed but outside some
        tile's window; 0 means the result is exact.
    """
    dims = grid.dims
    n_t0 = grid.points.shape[0]
    q = queries.shape[0]
    # VMEM: ~6 live [tile, window] f32 temporaries; keep tile*window bounded
    while tile > 8 and tile * window > 512 * 4096:
        tile //= 2
    pad = (-q) % tile
    qxyz = jnp.where(query_mask[:, None], queries, 1e9)
    qpacked = jnp.concatenate(
        [qxyz, query_mask[:, None].astype(jnp.float32), jnp.zeros((q, 4), jnp.float32)],
        axis=1,
    )
    qpacked = jnp.pad(qpacked, ((0, pad), (0, 0)))

    # target feature table in sorted-row order
    cols = [
        grid.points,
        grid.valid[:, None].astype(jnp.float32),
        grid.point_idx[:, None].astype(jnp.float32),
    ]
    n_extra = 0
    if extras is not None:
        ex = jnp.asarray(extras, jnp.float32)
        if ex.ndim == 1:
            ex = ex[:, None]
        n_extra = ex.shape[1]
        cols.append(ex[grid.point_idx])  # reorder to sorted-row order
    f_dim = 3 + 2 + n_extra
    fpad = (-f_dim) % 8
    if fpad:
        cols.append(jnp.zeros((n_t0, fpad), jnp.float32))
    tgt = jnp.concatenate(cols, axis=1)
    npad = (-n_t0) % 128
    if npad:
        tgt = jnp.pad(tgt, ((0, npad), (0, 0)))  # padded rows have valid=0
    n_t = n_t0 + npad
    window = min(window, n_t)
    tgt_t = tgt.T  # [F, N]
    f_tot = f_dim + fpad

    # per-tile needed row range from the CSR offsets (exact since the table
    # is sorted by flat cell id)
    v = dims[0] * dims[1] * dims[2]
    span = dims[1] * dims[2] + dims[2] + 1  # 3x3x3 stencil flat-id reach
    coords = jnp.floor((qxyz - grid.origin) / grid.cell_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(dims, jnp.int32) - 1)
    cid = _flat_cell_id(coords, dims)
    cid_lo = jnp.where(query_mask, cid, v - 1)
    cid_hi = jnp.where(query_mask, cid, 0)
    cid_lo = jnp.pad(cid_lo, (0, pad), constant_values=v - 1).reshape(-1, tile)
    cid_hi = jnp.pad(cid_hi, (0, pad), constant_values=0).reshape(-1, tile)
    cmin = jnp.clip(jnp.min(cid_lo, axis=1) - span, 0, v - 1)
    cmax = jnp.clip(jnp.max(cid_hi, axis=1) + span, 0, v - 1)
    ends = grid.cell_starts + grid.cell_counts
    lo_needed = grid.cell_starts[cmin]
    hi_needed = ends[cmax]
    lo = jnp.clip((lo_needed // 128) * 128, 0, n_t - window).astype(jnp.int32)
    unresolved = jnp.sum(jnp.maximum(hi_needed - (lo + window), 0).astype(jnp.float32))

    out = _knn_call(lo, tgt_t, qpacked, k, window, tile, float(max_radius) ** 2, interpret)
    out = out[:q].reshape(q, k, f_tot + 1)
    d2 = out[..., f_tot]
    ok = d2 < _BIG
    res = {
        "idx": jnp.where(ok, out[..., 4].astype(jnp.int32), 0),
        "dist": jnp.sqrt(jnp.where(ok, jnp.maximum(d2, 0.0), jnp.inf)),
        "ok": ok,
        "pts": out[..., 0:3],
        "unresolved": unresolved,
    }
    if extras is not None:
        res["extras"] = out[..., 5 : 5 + n_extra]
    return res
