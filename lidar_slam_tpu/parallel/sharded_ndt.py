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
)
from ..ops.pointcloud import PointCloud


def sharded_ndt_derivatives(ndt_map: NDTMap, source: PointCloud, pose, config: NDTConfig, mesh: Mesh):
    """One derivative evaluation with points sharded over the mesh."""
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
    )
    def _eval(m, pts, msk, w, pose6):
        s, g, h = ndt_derivatives(m, pts, msk, pose6, config, True, weights=w)
        return (
            jax.lax.psum(s, axis),
            jax.lax.psum(g, axis),
            jax.lax.psum(h, axis),
        )

    return _eval(ndt_map, source.points, source.mask, source.get_weights(), pose)


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
    pts = source.points
    msk = source.mask
    w = source.get_weights()

    def derivs(pose6, need_hessian):
        # need_hessian is threaded statically by newton_align's call sites
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def _eval(m, p_l, m_l, w_l, q):
            s, g, h = ndt_derivatives(m, p_l, m_l, q, config, need_hessian, weights=w_l)
            return (
                jax.lax.psum(s, axis),
                jax.lax.psum(g, axis),
                jax.lax.psum(h, axis),
            )

        return _eval(ndt_map, pts, msk, w, pose6)

    return newton_align(derivs, init_pose, config, source.num_valid())
