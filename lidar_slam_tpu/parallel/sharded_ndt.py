"""Point-sharded NDT registration over a device mesh.

The NDT derivative accumulation (models/registration/ndt.py) is an
embarrassingly parallel reduction over source points — the reference runs it
as a serial CPU loop (NormalDistributionsTransform.cpp:418-443). Here the
source cloud is sharded over the mesh's data axis with `shard_map`; each
device reduces its shard against a replicated voxel map and the 6-vector /
6x6 partials meet in a `psum` over ICI. The Newton + line-search control
loop (`newton_align`) runs replicated and stays in lockstep because every
device sees identical psum'd derivatives.

This is the scaling unit for multi-host registration: per-chip work scales
1/N with constant (6 + 36 floats) collective traffic per evaluation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.registration.ndt import (
    NDTConfig,
    NDTMap,
    NDTResult,
    ndt_derivatives,
    newton_align,
    sort_points_by_vid,
)
from ..ops.pointcloud import PointCloud


def _maybe_sort(ndt_map, pts, msk, w, pose_mat, config):
    """Global vid sort before sharding (fused path only): contiguous point
    shards become spatially coherent, so every device's per-tile key windows
    stay narrow — the same sort ndt_align applies single-device."""
    if config.resolve_gather() == "fused":
        # the sharded pose argument may be a 6-vector; sorting wants a [4,4]
        return sort_points_by_vid(ndt_map, pts, msk, w, pose_mat)
    return pts, msk, w


def sharded_ndt_derivatives(ndt_map: NDTMap, source: PointCloud, pose, config: NDTConfig, mesh: Mesh):
    """One derivative evaluation with points sharded over the mesh.

    Returns (score, grad, hess, unresolved) — the 4th element is the fused
    kernel's exactness guard summed over shards (0 == exact; always 0 on the
    XLA path).
    """
    axis = mesh.axis_names[0]
    from ..models.registration.ndt import _pose_to_matrix

    pts, msk, w = _maybe_sort(
        ndt_map,
        source.points,
        source.mask,
        source.get_weights(),
        _pose_to_matrix(jnp.asarray(pose, jnp.float32)),
        config,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def _eval(m, pts, msk, w, pose6):
        s, g, h, u = ndt_derivatives(
            m, pts, msk, pose6, config, True, weights=w, return_unresolved=True
        )
        return (
            jax.lax.psum(s, axis),
            jax.lax.psum(g, axis),
            jax.lax.psum(h, axis),
            jax.lax.psum(u, axis),
        )

    return _eval(ndt_map, pts, msk, w, pose)


@partial(jax.jit, static_argnames=("config", "mesh"))
def sharded_ndt_align(
    ndt_map: NDTMap,
    source: PointCloud,
    init_pose,
    config: NDTConfig,
    mesh: Mesh,
) -> NDTResult:
    """ndt_align with the per-point reduction sharded over `mesh`.

    Point capacity must divide the mesh size (pad the cloud; padded points
    are masked out and contribute zeros everywhere).
    """
    axis = mesh.axis_names[0]
    pts, msk, w = _maybe_sort(
        ndt_map,
        source.points,
        source.mask,
        source.get_weights(),
        jnp.asarray(init_pose, jnp.float32),
        config,
    )

    def derivs(pose6, need_hessian):
        # need_hessian is threaded statically by newton_align's call sites
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        def _eval(m, p_l, m_l, w_l, q):
            s, g, h, u = ndt_derivatives(
                m, p_l, m_l, q, config, need_hessian, weights=w_l, return_unresolved=True
            )
            return (
                jax.lax.psum(s, axis),
                jax.lax.psum(g, axis),
                jax.lax.psum(h, axis),
                jax.lax.psum(u, axis),
            )

        return _eval(ndt_map, pts, msk, w, pose6)

    return newton_align(derivs, init_pose, config, source.num_valid())
