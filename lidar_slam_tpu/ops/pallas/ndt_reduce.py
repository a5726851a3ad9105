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
    """One grid step: [T, S] vids -> [T, S, F] stats rows.

    keys: [1, C] int32 flat voxel ids of compact rows (sentinel rows use -1,
    which never matches a real vid).
    table: [C, F] float32 packed stats.
    """
    vids = vids_ref[:]  # [T, S] int32
    t, s = vids.shape
    c = keys_ref.shape[1]
    f = table_ref.shape[1]
    flat = vids.reshape(t * s, 1)
    onehot = (flat == keys_ref[:]).astype(jnp.float32)  # [T*S, C]
    rows = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = rows.reshape(t, s, f)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_stats_onehot(keys, table, vids, tile: int = 8, interpret: bool = False):
    """Gather packed stat rows for every (point, slot) voxel id.

    Args:
      keys: [C] int32 flat voxel id per compact row (-1 for unused rows).
      table: [C, F] float32 stats (row i corresponds to keys[i]).
      vids: [N, S] int32 query voxel ids (any id absent from keys yields a
        zero row — the natural sentinel).
      tile: points per grid step (VMEM budget: tile*S*C one-hot floats).
    Returns:
      [N, S, F] float32.
    """
    n, s = vids.shape
    c, f = table.shape
    pad = (-n) % tile
    vids_p = jnp.pad(vids, ((0, pad), (0, 0)), constant_values=-2)
    np_ = n + pad

    out = pl.pallas_call(
        _gather_kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, s, f), jnp.float32),
        interpret=interpret,
    )(keys.reshape(1, c), table, vids_p)
    return out[:n]


def ndt_derivatives_pallas(ndt_map, points, mask, pose, config, compute_hessian=True, weights=None):
    """Drop-in variant of models.registration.ndt.ndt_derivatives using the
    one-hot kernel for the stats fetch. Requires the map's compact table
    keys; see build_ndt_map (NDTMap.packed / NDTMap.keys)."""
    raise NotImplementedError(
        "wired in a later revision: use gather_stats_onehot for the fetch stage"
    )
