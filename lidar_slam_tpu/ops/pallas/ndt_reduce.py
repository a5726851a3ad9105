"""Pallas TPU kernel: NDT voxel-stat gather as a one-hot MXU matmul.

The NDT derivative evaluation is gather-bound on TPU: per (point, stencil
slot) it needs a 64 B packed-stats row keyed by voxel id, and XLA's gather
issues element-wise (measured ~12 ms/eval for 32k points x 27 slots against
a 4M-voxel grid, even with a two-level compact table). Mosaic has no
general VMEM dynamic-gather either (probed; lowering rejects both jnp.take
and take_along_axis for this shape class).

The TPU-idiomatic trick: the compact occupied-voxel table is small (<= a
few k rows for a local map), so a row lookup is a SELECTION — expressible
as  onehot(vids == keys) @ table  with the one-hot built by a VPU compare
against the stored keys and the selection contracted on the MXU. No gather
instruction at all, and the dense index grid disappears entirely (keys are
compared directly against flat voxel ids).

This module provides the gather stage; the surrounding derivative math
stays in XLA (already validated against finite differences).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _gather_kernel(keys_ref, table_ref, vids_ref, out_ref):
    """One grid step: [R, 1] vids -> [R, F] stats rows. Reshape-free on
    purpose — Mosaic rejects in-kernel shape casts ("infer-vector-layout:
    unsupported shape cast"); all row flattening happens outside.

    keys: [1, C] int32 flat voxel ids of compact rows (sentinel rows use -1,
    which never matches a real vid).
    table: [C, F] float32 packed stats.
    """
    onehot = (vids_ref[:] == keys_ref[:]).astype(jnp.float32)  # [R, C]
    out_ref[:] = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_stats_onehot(keys, table, vids, tile: int = 256, interpret: bool = False):
    """Gather packed stat rows for every (point, slot) voxel id.

    Args:
      keys: [C] int32 flat voxel id per compact row (-1 for unused rows).
      table: [C, F] float32 stats (row i corresponds to keys[i]).
      vids: [N, S] int32 query voxel ids (any id absent from keys yields a
        zero row — the natural sentinel).
      tile: flattened (point, slot) rows per grid step (VMEM budget:
        tile * C one-hot floats).
    Returns:
      [N, S, F] float32.
    """
    n, s = vids.shape
    c, f = table.shape
    rows = vids.reshape(n * s, 1)
    pad = (-(n * s)) % tile
    rows_p = jnp.pad(rows, ((0, pad), (0, 0)), constant_values=-2)
    total = n * s + pad

    out = pl.pallas_call(
        _gather_kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, f), jnp.float32),
        interpret=interpret,
    )(keys.reshape(1, c), table, rows_p)
    return out[: n * s].reshape(n, s, f)


def ndt_derivatives_pallas(ndt_map, points, mask, pose, config, compute_hessian=True, weights=None):
    """Drop-in variant of models.registration.ndt.ndt_derivatives using the
    one-hot kernel for the stats fetch. Requires the map's compact table
    keys; see build_ndt_map (NDTMap.packed / NDTMap.keys)."""
    raise NotImplementedError(
        "wired in a later revision: use gather_stats_onehot for the fetch stage"
    )
