"""Node-sharded distributed pose-graph solve via Schur complement.

The edge-sharded PCG (sharded_graph.py) replicates node state and psums a
[N, 6] matvec per CG iteration — right while N is small. This module is the
scale-out path promised by BASELINE.md ("per-block reduced Hessians combined
via Schur complement"): NODES are partitioned into contiguous blocks, one
per device, and each LM iteration solves the damped normal equations
EXACTLY by two-level domain decomposition:

  1. Every device assembles and Cholesky-factors its own interior system
     H_II (dense [6m, 6m] on the MXU — interiors of different blocks are
     independent, so all devices factor in parallel).
  2. The SEPARATOR system (nodes incident to cross-block edges; a small,
     host-computed set) is reduced: S = C_SS - sum_b F_b^T H_II^-1 F_b and
     its right-hand side are combined with one psum each, then the small
     [6S, 6S] system is Cholesky-solved replicated.
  3. Interior updates back-substitute locally: d_I = H_II^-1 (b_I - F d_S).

For a SLAM trajectory graph (odometry chain + sparse loop edges) the
separator set is tiny — 2 nodes per block boundary plus the endpoints of
cross-block loop closures — so the replicated stage is negligible and the
heavy factorization scales with (N / n_devices)^3.

This is an exact solve of the same damped system LM uses on one device
(g2o `lm_var` semantics, g2o_graph_optimizer.cpp:30-56), not an iterative
approximation: chi2 trajectories match the dense single-device solver to
float tolerance (tests/test_parallel.py).

Host-side preparation (`schur_prepare`) computes the node partition,
separator list, and per-device edge ownership; the device program is a
single `shard_map` whose only collectives are two psums per LM iteration
([6S, 6S] + [6S]) and the scalar chi2 psum.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.graph_optimizer import (
    GraphOptimizerConfig,
    PoseGraph,
    _edge_residuals_jacobians,
    _prior_residuals_jacobians,
    _robust_weight,
    _apply_update,
    graph_chi2,
)


@flax.struct.dataclass
class SchurGraph:
    """A PoseGraph re-laid-out for the node-sharded Schur solve.

    Node arrays are replicated; edge/prior arrays are grouped so that the
    d-th contiguous chunk holds exactly the elements OWNED by device d
    (an edge is owned by the block of its first interior endpoint; edges
    between two separators may be owned by either — schur_prepare uses the
    block of node i).
    """

    graph: PoseGraph  # edge/prior arrays grouped by owner, padded per device
    sep_pos: jax.Array  # [N] int32: separator slot of node, or -1
    sep_nodes: jax.Array  # [S_cap] int32 node index per separator slot (0-pad)
    sep_valid: jax.Array  # [S_cap] bool
    n_blocks: int = flax.struct.field(pytree_node=False)
    block_size: int = flax.struct.field(pytree_node=False)  # nodes per block
    sep_cap: int = flax.struct.field(pytree_node=False)


def schur_prepare(graph: PoseGraph, n_devices: int, sep_cap: int = 256) -> SchurGraph:
    """Host-side layout: partition nodes, find separators, group edges.

    Raises if the separator set exceeds sep_cap or any device's edge/prior
    share exceeds capacity / n_devices (capacities must divide n_devices).
    """
    poses = np.asarray(graph.poses)
    n = poses.shape[0]
    if n % n_devices:
        raise ValueError(f"node capacity {n} must divide n_devices {n_devices}")
    m = n // n_devices

    eij = np.asarray(graph.edge_ij)
    evalid = np.asarray(graph.edge_valid)
    block = lambda node: node // m

    # separators: endpoints of cross-block edges
    cross = evalid & (block(eij[:, 0]) != block(eij[:, 1]))
    sep_set = np.unique(np.concatenate([eij[cross, 0], eij[cross, 1]]))
    if len(sep_set) > sep_cap:
        raise ValueError(f"{len(sep_set)} separators exceed sep_cap {sep_cap}")
    sep_pos = np.full(n, -1, np.int32)
    sep_pos[sep_set] = np.arange(len(sep_set), dtype=np.int32)
    sep_nodes = np.zeros(sep_cap, np.int32)
    sep_nodes[: len(sep_set)] = sep_set
    sep_valid = np.zeros(sep_cap, bool)
    sep_valid[: len(sep_set)] = True

    # group edges by owner block
    e_cap = eij.shape[0]
    if e_cap % n_devices:
        raise ValueError(f"edge capacity {e_cap} must divide n_devices {n_devices}")
    epd = e_cap // n_devices
    owner = block(eij[:, 0])
    order = []
    for d in range(n_devices):
        idx = np.where(evalid & (owner == d))[0]
        if len(idx) > epd:
            raise ValueError(f"device {d} owns {len(idx)} edges > {epd} capacity")
        pad = np.where(~evalid)[0][: epd - len(idx)]
        if len(pad) < epd - len(idx):
            raise ValueError("not enough invalid edge slots to pad device shares")
        order.append(np.concatenate([idx, pad]))
    eorder = np.concatenate(order)

    pn = np.asarray(graph.prior_node)
    pvalid = np.asarray(graph.prior_valid)
    p_cap = pn.shape[0]
    if p_cap % n_devices:
        raise ValueError(f"prior capacity {p_cap} must divide n_devices {n_devices}")
    ppd = p_cap // n_devices
    powner = block(pn)
    porder = []
    for d in range(n_devices):
        idx = np.where(pvalid & (powner == d))[0]
        if len(idx) > ppd:
            raise ValueError(f"device {d} owns {len(idx)} priors > {ppd} capacity")
        pad = np.where(~pvalid)[0][: ppd - len(idx)]
        if len(pad) < ppd - len(idx):
            raise ValueError("not enough invalid prior slots to pad device shares")
        porder.append(np.concatenate([idx, pad]))
    porder = np.concatenate(porder)

    g = graph.replace(
        edge_ij=graph.edge_ij[eorder],
        edge_meas=graph.edge_meas[eorder],
        edge_info=graph.edge_info[eorder],
        edge_valid=graph.edge_valid[eorder],
        prior_node=graph.prior_node[porder],
        prior_xyz=graph.prior_xyz[porder],
        prior_info=graph.prior_info[porder],
        prior_valid=graph.prior_valid[porder],
        prior_quat=graph.prior_quat[porder],
        prior_type=graph.prior_type[porder],
    )
    return SchurGraph(
        graph=g,
        sep_pos=jnp.asarray(sep_pos),
        sep_nodes=jnp.asarray(sep_nodes),
        sep_valid=jnp.asarray(sep_valid),
        n_blocks=n_devices,
        block_size=m,
        sep_cap=sep_cap,
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def optimize_pose_graph_schur(
    sg: SchurGraph, cfg: GraphOptimizerConfig, mesh: Mesh
) -> Tuple[PoseGraph, dict]:
    """LM with the exact two-level Schur solve. Same accept/reject schedule
    as optimize_pose_graph. Returns (optimized PoseGraph, stats)."""
    axis = mesh.axis_names[0]
    m = sg.block_size
    s_cap = sg.sep_cap
    graph = sg.graph
    six = jnp.arange(6, dtype=jnp.int32)

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
        in_specs=(espec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _optimize(g: PoseGraph, sep_pos, sep_nodes, sep_valid):
        d = jax.lax.axis_index(axis)
        base = d * m  # first node of this block

        free = g.node_valid & ~g.node_fixed  # [N]
        # local slot of a node: 0..m-1 for own nodes, m = trash row
        def local_slot(node):
            own = (node >= base) & (node < base + m) & (sep_pos[node] < 0) & free[node]
            return jnp.where(own, node - base, m), own

        def sep_slot(node):
            is_sep = (sep_pos[node] >= 0) & free[node]
            return jnp.where(is_sep, sep_pos[node], s_cap), is_sep

        def chi2(poses):
            return jax.lax.psum(graph_chi2(g.replace(poses=poses), cfg), axis)

        chi2_0 = chi2(g.poses)

        def solve(poses, lam):
            gl = g.replace(poses=poses)
            r, Ji, Jj = _edge_residuals_jacobians(gl)
            lam_e = gl.edge_info
            ce = jnp.sum(r * r * lam_e, axis=-1)
            w = _robust_weight(ce, cfg) * gl.edge_valid

            LJi = lam_e[:, :, None] * Ji
            LJj = lam_e[:, :, None] * Jj
            Hii = jnp.einsum("e,eki,ekj->eij", w, Ji, LJi)
            Hjj = jnp.einsum("e,eki,ekj->eij", w, Jj, LJj)
            Hij = jnp.einsum("e,eki,ekj->eij", w, Ji, LJj)
            bi = jnp.einsum("e,eki,ek->ei", w, Ji, lam_e * r)
            bj = jnp.einsum("e,eki,ek->ei", w, Jj, lam_e * r)

            rp, Jp = _prior_residuals_jacobians(gl)
            wp = gl.prior_valid.astype(jnp.float32)
            LJp = gl.prior_info[:, :, None] * Jp
            Hp = jnp.einsum("p,pki,pkj->pij", wp, Jp, LJp)
            bp = jnp.einsum("p,pki,pk->pi", wp, Jp, gl.prior_info * rp)

            ei, ej = gl.edge_ij[:, 0], gl.edge_ij[:, 1]
            li, own_i = local_slot(ei)
            lj, own_j = local_slot(ej)
            si, is_si = sep_slot(ei)
            sj, is_sj = sep_slot(ej)
            lp, own_p = local_slot(gl.prior_node)
            sp, is_sp = sep_slot(gl.prior_node)

            # dense local interior system (m+1 slots; last is trash), the
            # interior-separator coupling F, and partial separator system C
            A = jnp.zeros(((m + 1) * 6, (m + 1) * 6), jnp.float32)
            F = jnp.zeros(((m + 1) * 6, (s_cap + 1) * 6), jnp.float32)
            C = jnp.zeros(((s_cap + 1) * 6, (s_cap + 1) * 6), jnp.float32)
            b_I = jnp.zeros(((m + 1) * 6,), jnp.float32)
            b_S = jnp.zeros(((s_cap + 1) * 6,), jnp.float32)

            def rc(a, b):
                rr = a[:, None, None] * 6 + six[None, :, None]
                cc = b[:, None, None] * 6 + six[None, None, :]
                k = a.shape[0]
                return (
                    jnp.broadcast_to(rr, (k, 6, 6)),
                    jnp.broadcast_to(cc, (k, 6, 6)),
                )

            def madd(M, blk, a, b, sel):
                rr, cc = rc(a, b)
                return M.at[rr, cc].add(blk * sel[:, None, None])

            def vadd(v, blk, a, sel):
                rr = a[:, None] * 6 + six[None, :]
                return v.at[rr].add(blk * sel[:, None])

            one = jnp.ones_like(w)
            # diagonal blocks
            A = madd(A, Hii, li, li, own_i.astype(jnp.float32))
            A = madd(A, Hjj, lj, lj, own_j.astype(jnp.float32))
            A = madd(A, Hp, lp, lp, own_p.astype(jnp.float32))
            C = madd(C, Hii, si, si, is_si.astype(jnp.float32))
            C = madd(C, Hjj, sj, sj, is_sj.astype(jnp.float32))
            C = madd(C, Hp, sp, sp, is_sp.astype(jnp.float32))
            # off-diagonal: interior-interior / interior-separator / sep-sep
            sel_ii = (own_i & own_j).astype(jnp.float32)
            A = madd(A, Hij, li, lj, sel_ii)
            A = madd(A, Hij.swapaxes(-1, -2), lj, li, sel_ii)
            sel_is = (own_i & is_sj).astype(jnp.float32)
            F = madd(F, Hij, li, sj, sel_is)
            sel_si = (is_si & own_j).astype(jnp.float32)
            F = madd(F, Hij.swapaxes(-1, -2), lj, si, sel_si)
            sel_ss = (is_si & is_sj).astype(jnp.float32)
            C = madd(C, Hij, si, sj, sel_ss)
            C = madd(C, Hij.swapaxes(-1, -2), sj, si, sel_ss)
            # gradient
            b_I = vadd(b_I, bi, li, own_i.astype(jnp.float32))
            b_I = vadd(b_I, bj, lj, own_j.astype(jnp.float32))
            b_I = vadd(b_I, bp, lp, own_p.astype(jnp.float32))
            b_S = vadd(b_S, bi, si, is_si.astype(jnp.float32))
            b_S = vadd(b_S, bj, sj, is_sj.astype(jnp.float32))
            b_S = vadd(b_S, bp, sp, is_sp.astype(jnp.float32))

            # trim trash rows/cols, damp, neutralize empty slots
            A = A[: m * 6, : m * 6]
            F = F[: m * 6, : s_cap * 6]
            C = C[: s_cap * 6, : s_cap * 6]
            b_I = b_I[: m * 6]
            b_S = b_S[: s_cap * 6]

            own_nodes = base + jnp.arange(m)
            act_I = (
                free[own_nodes] & (sep_pos[own_nodes] < 0)
            ).astype(jnp.float32)
            act_I6 = jnp.repeat(act_I, 6)
            A = A * act_I6[:, None] * act_I6[None, :] + jnp.diag(1.0 - act_I6)
            A = A + lam * jnp.diag(act_I6)
            b_I = b_I * act_I6

            # interior factorization + A^-1 [b_I | F]
            L = jnp.linalg.cholesky(A)
            AinvF = jax.scipy.linalg.cho_solve((L, True), F)  # [6m, 6S]
            Ainvb = jax.scipy.linalg.cho_solve((L, True), b_I)  # [6m]

            # reduced separator system (psum over blocks)
            S_part = C - F.T @ AinvF
            rhs_part = b_S - F.T @ Ainvb
            S_sum = jax.lax.psum(S_part, axis)
            rhs = jax.lax.psum(rhs_part, axis)

            act_S = (sep_valid & free[sep_nodes]).astype(jnp.float32)
            act_S6 = jnp.repeat(act_S, 6)
            S_sum = S_sum * act_S6[:, None] * act_S6[None, :] + jnp.diag(1.0 - act_S6)
            S_sum = S_sum + lam * jnp.diag(act_S6)
            rhs = rhs * act_S6
            Ls = jnp.linalg.cholesky(S_sum)
            d_S = jax.scipy.linalg.cho_solve((Ls, True), rhs)  # [6S]

            # back-substitute interiors
            d_I = Ainvb - AinvF @ d_S  # [6m]

            # assemble the full [N, 6] delta: own interiors via psum-scatter,
            # separators replicated
            delta = jnp.zeros((free.shape[0], 6), jnp.float32)
            delta = delta.at[own_nodes].set(d_I.reshape(m, 6) * act_I[:, None])
            delta = jax.lax.psum(delta, axis)
            dS = d_S.reshape(s_cap, 6) * act_S[:, None]
            delta = delta.at[sep_nodes].add(
                dS * sep_valid[:, None], mode="drop"
            )
            return delta

        def lm_body(st):
            poses, cur_chi2, it, lam, _, _ = st
            delta = solve(poses, lam)
            new_poses = _apply_update(poses, delta, free)
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

    poses, stats = _optimize(graph, sg.sep_pos, sg.sep_nodes, sg.sep_valid)
    out = graph.replace(poses=poses)
    return out, {
        "chi2_before": stats[0],
        "chi2_after": stats[1],
        "iterations": stats[2],
        "lambda": stats[3],
    }
