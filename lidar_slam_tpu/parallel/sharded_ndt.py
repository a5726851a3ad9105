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
    _condition_rows,
    _moments_from_sums,
    _pack_rows,
    empty_ndt_sums,
    ndt_derivatives,
    newton_align,
    scatter_to_sums,
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


def _slab_reduce_and_pack(axis, n_dev, origin, sums_fields, config: NDTConfig):
    """Shared tail of the sharded map builders (runs INSIDE shard_map).

    Each device holds full-grid partial moment sums from its own shard of the
    input. reduce-scatter sums them and leaves each device owning one
    contiguous voxel slab (flat-id order = x-slabs); the per-voxel
    finalization FLOPs (centroid, covariance, closed-form 3x3 eigh,
    conditioned inverse) then run sharded on the slab. Only the finished
    16-float rows are all-gathered for the global compaction (a cumsum —
    inherently global, but cheap)."""
    count, psum, ppsum, wsum = sums_fields
    v = count.shape[0]
    slab = v // n_dev
    # reduce-scatter the partial sums: [V] -> this device's [V/n] slab
    count_s = jax.lax.psum_scatter(count, axis, scatter_dimension=0, tiled=True)
    psum_s = jax.lax.psum_scatter(psum, axis, scatter_dimension=0, tiled=True)
    ppsum_s = jax.lax.psum_scatter(ppsum, axis, scatter_dimension=0, tiled=True)
    wsum_s = jax.lax.psum_scatter(wsum, axis, scatter_dimension=0, tiled=True)

    vid_start = jax.lax.axis_index(axis) * slab
    cnt, mean, cov, sv = _moments_from_sums(
        origin, count_s, psum_s, ppsum_s, wsum_s, config.grid_dims,
        config.resolution, vid_start=vid_start,
    )
    rows, icov, valid = _condition_rows(cnt, mean, cov, sv, config)

    # gather the finished slabs; the compact packing (global cumsum over
    # valid flags) runs replicated on the gathered rows
    def gather(x):
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    return _pack_rows(
        origin,
        gather(cnt),
        gather(mean),
        gather(icov),
        gather(sv),
        gather(rows),
        gather(valid),
        config.grid_dims,
        config,
    )


@partial(jax.jit, static_argnames=("config", "mesh"))
def sharded_build_ndt_map(
    cloud: PointCloud, origin, config: NDTConfig, mesh: Mesh
) -> NDTMap:
    """build_ndt_map with points sharded over the mesh and the per-voxel
    finalization sharded over voxel slabs.

    TPU-native replacement for the reference's serial VoxelGrid::setInput
    (VoxelGrid.cpp:244-325) at multi-chip scale: each device scatters its
    point shard into full-grid moment sums (segment_sum), a reduce_scatter
    rides ICI to both SUM the partials and SHARD the voxel axis, and the
    eigendecomposition/conditioning — the map-build FLOPs — runs on slabs.
    Output is the replicated NDTMap the (point-sharded) align path consumes.

    Point capacity and the flat voxel count must divide the mesh size.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    v = config.grid_dims[0] * config.grid_dims[1] * config.grid_dims[2]
    if v % n_dev:
        raise ValueError(f"voxel count {v} must divide mesh size {n_dev}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def _build(pts, msk, wts, origin_arr):
        sums = empty_ndt_sums(origin_arr, config)
        sums = scatter_to_sums(sums, pts, msk, wts)
        return _slab_reduce_and_pack(
            axis, n_dev, origin_arr, (sums.count, sums.psum, sums.ppsum, sums.wsum), config
        )

    return _build(
        cloud.points, cloud.mask, cloud.get_weights(), jnp.asarray(origin, jnp.float32)
    )


@partial(jax.jit, static_argnames=("config", "mesh"))
def sharded_build_local_map(
    kf_points,  # [K, P, 3] keyframe clouds (sensor frame)
    kf_masks,  # [K, P]
    kf_weights,  # [K, P]
    kf_poses,  # [K, 4, 4]
    kf_valid,  # [K] bool
    origin,  # [3] lattice-multiple grid corner
    config: NDTConfig,
    mesh: Mesh,
) -> NDTMap:
    """Keyframe-sharded local-map assembly: the front end's 20-keyframe NDT
    target built with KEYFRAMES sharded over devices (each device transforms
    and scatters only its keyframes; voxel stats meet in the reduce_scatter).
    Multi-chip form of FrontEnd::UpdateWithNewFrame's map rebuild
    (front_end.cpp:348-424). K must divide the mesh size."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    v = config.grid_dims[0] * config.grid_dims[1] * config.grid_dims[2]
    if v % n_dev:
        raise ValueError(f"voxel count {v} must divide mesh size {n_dev}")
    if kf_points.shape[0] % n_dev:
        raise ValueError(f"keyframe count {kf_points.shape[0]} must divide mesh size {n_dev}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def _build(pts_k, msk_k, wts_k, poses_k, valid_k, origin_arr):
        world = (
            jnp.einsum("kij,kpj->kpi", poses_k[:, :3, :3], pts_k)
            + poses_k[:, None, :3, 3]
        )
        k, p, _ = world.shape
        pts = world.reshape(k * p, 3)
        msk = (msk_k & valid_k[:, None]).reshape(k * p)
        wts = wts_k.reshape(k * p)
        sums = empty_ndt_sums(origin_arr, config)
        sums = scatter_to_sums(sums, pts, msk, wts)
        return _slab_reduce_and_pack(
            axis, n_dev, origin_arr, (sums.count, sums.psum, sums.ppsum, sums.wsum), config
        )

    return _build(
        kf_points, kf_masks, kf_weights, kf_poses, kf_valid,
        jnp.asarray(origin, jnp.float32),
    )


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
