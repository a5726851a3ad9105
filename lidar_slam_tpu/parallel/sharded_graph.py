"""Edge-sharded distributed pose-graph optimization.

The reference's g2o solve is a single-threaded sparse CPU factorization
(g2o_graph_optimizer.cpp:30-56). Here the EDGE set (and prior set) is
sharded over the mesh's data axis; every device linearizes its own edges,
and the PCG solve runs on matrix-free matvecs whose node-indexed
scatter-adds are completed by a `psum` over ICI — the per-iteration
collective is one [N, 6] array. Node state stays replicated, which is the
right layout while N(odes) << E(dges) x 36; per-node sharding with a Schur
complement is the follow-on for very large graphs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.graph_optimizer import (
    GraphOptimizerConfig,
    PoseGraph,
    _assemble,
    _diag_blocks,
    _gradient,
    _matvec,
    graph_chi2,
    _apply_update,
)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def optimize_pose_graph_sharded(
    graph: PoseGraph, cfg: GraphOptimizerConfig, mesh: Mesh
):
    """LM + PCG with edges/priors sharded over `mesh`. Edge and prior
    capacities must divide the mesh size. Returns (graph, stats) with the
    same semantics as optimize_pose_graph(solver='pcg')."""
    axis = mesh.axis_names[0]

    espec = PoseGraph(
        poses=P(),
        node_valid=P(),
        node_fixed=P(),
        edge_ij=P(axis),
        edge_meas=P(axis),
        edge_info=P(axis),
        edge_valid=P(axis),
        prior_node=P(axis),
        prior_xyz=P(axis),
        prior_info=P(axis),
        prior_valid=P(axis),
        prior_quat=P(axis),
        prior_type=P(axis),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(espec,),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _optimize(g: PoseGraph):
        def chi2(poses):
            return jax.lax.psum(graph_chi2(g.replace(poses=poses), cfg), axis)

        chi2_0 = chi2(g.poses)

        def lm_body(st):
            poses, cur_chi2, it, lam, _, _ = st
            gl = g.replace(poses=poses)
            asm = _assemble(gl, cfg)
            b = jax.lax.psum(_gradient(asm), axis)
            D = jax.lax.psum(_diag_blocks(asm), axis) + (lam + 1e-8) * jnp.eye(6)
            Dinv = jnp.linalg.inv(D)
            free = asm["free"][:, None]

            def precond(v):
                return jnp.einsum("nij,nj->ni", Dinv, v) * free

            def matvec(x):
                return jax.lax.psum(_matvec(asm, 0.0, x), axis) + lam * x * free

            bb = b * free
            x0 = jnp.zeros_like(bb)
            r0 = bb
            z0 = precond(r0)
            rz0 = jnp.sum(r0 * z0)
            b2 = jnp.maximum(jnp.sum(bb * bb), 1e-30)

            def pcg_cond(s):
                _, r, _, _, k = s
                return (jnp.sum(r * r) / b2 > cfg.pcg_tol**2) & (k < cfg.pcg_iters)

            def pcg_body(s):
                x, r, p, rz, k = s
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_n = jnp.sum(r * z)
                beta = rz_n / jnp.maximum(rz, 1e-30)
                return (x, r, z + beta * p, rz_n, k + 1)

            delta, _, _, _, _ = jax.lax.while_loop(pcg_cond, pcg_body, (x0, r0, z0, rz0, jnp.int32(0)))
            new_poses = _apply_update(poses, delta, asm["free"])
            new_chi2 = chi2(new_poses)
            accept = new_chi2 < cur_chi2
            poses_out = jnp.where(accept, new_poses, poses)
            chi2_out = jnp.where(accept, new_chi2, cur_chi2)
            lam_out = jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor)
            rel = jnp.abs(cur_chi2 - chi2_out) / jnp.maximum(cur_chi2, 1e-12)
            done = (accept & (rel < cfg.chi2_rel_tol)) | (lam_out > 1e6)
            return (poses_out, chi2_out, it + 1, lam_out, cur_chi2, done)

        def lm_cond(st):
            _, _, it, _, _, done = st
            return (~done) & (it < cfg.max_iterations)

        init = (
            g.poses,
            chi2_0,
            jnp.int32(0),
            jnp.float32(cfg.lm_lambda_init),
            chi2_0,
            jnp.bool_(False),
        )
        poses, chi2_f, iters, lam, _, _ = jax.lax.while_loop(lm_cond, lm_body, init)
        stats = jnp.stack([chi2_0, chi2_f, iters.astype(jnp.float32), lam])
        return poses, stats

    poses, stats = _optimize(graph)
    out = graph.replace(poses=poses)
    return out, {
        "chi2_before": stats[0],
        "chi2_after": stats[1],
        "iterations": stats[2],
        "lambda": stats[3],
    }
