"""SE(3) pose-graph optimization on TPU.

Replaces the reference's g2o wrapper (src/models/graph_optimizer/g2o/
g2o_graph_optimizer.cpp:13-184 — `lm_var` Levenberg-Marquardt over SE3 nodes,
odometry/loop SE3 binary edges, GNSS XYZ prior unary edges, optional robust
kernels) with a pure-JAX implementation over fixed-capacity edge arrays:

- Residuals/Jacobians are batched over all edges at once (analytic SE(3)
  Jacobians with the 2nd-order inverse right Jacobian).
- Two linear solvers:
  * ``dense``  — materialize the 6Nx6N normal matrix and Cholesky-solve on
    the MXU. For the reference's scale (366 nodes, back_end log) this is a
    single fused device computation vs g2o's 91.6 ms CPU solve.
  * ``pcg``    — matrix-free preconditioned CG on edge-wise matvecs
    (segment_sum gather/scatter), block-Jacobi preconditioner. Scales to
    graphs where 6Nx6N no longer fits and is the basis of the multi-host
    distributed solve (parallel/sharded_graph.py).
- Levenberg-Marquardt with the variable-lambda schedule (accept/reject, x2
  up/down), Huber robust kernel optional — matching g2o `lm_var` +
  `RobustKernelHuber` semantics (g2o_graph_optimizer.cpp:90-140).

Node parameterization: right perturbation T <- T exp(delta), delta = (rho,
phi). The first node (or any `fixed` node) is clamped, as AddSe3Node(...,
need_fix=true) does (g2o_graph_optimizer.cpp:78-88).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..geom.se3 import se3_exp, se3_log, so3_hat, pose_inverse


@dataclasses.dataclass(frozen=True)
class GraphOptimizerConfig:
    max_iterations: int = 512  # g2o_graph_optimizer.hpp max_iterations_num
    # 'auto' picks dense (one MXU Cholesky) while 6*max_nodes <= dense_limit
    # and matrix-free PCG beyond — the dense normal matrix is padded ~28x by
    # TPU tiling at large n and OOMs around n ~ 2k nodes.
    solver: str = "auto"  # 'auto' | 'dense' | 'pcg'
    dense_limit: int = 4096
    lm_lambda_init: float = 1e-4
    lm_lambda_factor: float = 2.0
    chi2_rel_tol: float = 1e-6
    robust_kernel: str = "none"  # 'none' | 'huber'
    robust_delta: float = 1.0
    pcg_iters: int = 100
    pcg_tol: float = 1e-6


@flax.struct.dataclass
class PoseGraph:
    """Fixed-capacity pose graph (pytree)."""

    poses: jax.Array  # [N, 4, 4]
    node_valid: jax.Array  # [N] bool
    node_fixed: jax.Array  # [N] bool
    edge_ij: jax.Array  # [E, 2] int32 (i, j)
    edge_meas: jax.Array  # [E, 4, 4]  Z_ij ~ T_i^-1 T_j
    edge_info: jax.Array  # [E, 6] diagonal information (trans, rot)
    edge_valid: jax.Array  # [E] bool
    prior_node: jax.Array  # [P] int32
    prior_xyz: jax.Array  # [P, 3] XYZ measurement (prior_type 0)
    prior_info: jax.Array  # [P, 3]
    prior_valid: jax.Array  # [P] bool
    # unary priors are typed: 0 = XYZ translation (EdgeSE3PriorXYZ,
    # edge_se3_priorxyz.hpp:14-55), 1 = quaternion orientation
    # (EdgeSE3PriorQuat, edge_se3_priorquat.hpp:14-60). Both have 3-dim
    # residuals, so one shared info/assembly path serves both.
    prior_quat: jax.Array  # [P, 4] (w, x, y, z), w >= 0 (prior_type 1)
    prior_type: jax.Array  # [P] int32

    @staticmethod
    def empty(max_nodes: int, max_edges: int, max_priors: int) -> "PoseGraph":
        ident_q = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (max_priors, 1))
        return PoseGraph(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max_nodes, 1, 1)),
            node_valid=jnp.zeros(max_nodes, bool),
            node_fixed=jnp.zeros(max_nodes, bool),
            edge_ij=jnp.zeros((max_edges, 2), jnp.int32),
            edge_meas=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max_edges, 1, 1)),
            edge_info=jnp.ones((max_edges, 6), jnp.float32),
            edge_valid=jnp.zeros(max_edges, bool),
            prior_node=jnp.zeros(max_priors, jnp.int32),
            prior_xyz=jnp.zeros((max_priors, 3), jnp.float32),
            prior_info=jnp.ones((max_priors, 3), jnp.float32),
            prior_valid=jnp.zeros(max_priors, bool),
            prior_quat=ident_q,
            prior_type=jnp.zeros(max_priors, jnp.int32),
        )


def _adjoint(T):
    """SE(3) adjoint [..., 6, 6] acting on (rho, phi)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    top = jnp.concatenate([R, so3_hat(t) @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _ad_se3(xi):
    """se(3) 'little adjoint' ad_xi [..., 6, 6]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    ph = so3_hat(phi)
    rh = so3_hat(rho)
    top = jnp.concatenate([ph, rh], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(ph), ph], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv_right_jacobian(r):
    """Jr^{-1}(r) ~ I + ad(r)/2 + ad(r)^2/12 (2nd-order; residuals are small)."""
    ad = _ad_se3(r)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), ad.shape)
    return eye + 0.5 * ad + (1.0 / 12.0) * (ad @ ad)


def _edge_residuals_jacobians(graph: PoseGraph):
    """Batched residuals + Jacobians for all binary edges.

    r = log(Z^-1 T_i^-1 T_j);  J_j = Jr^{-1}(r);
    J_i = -Jr^{-1}(r) Adj(T_j^-1 T_i).
    """
    Ti = graph.poses[graph.edge_ij[:, 0]]
    Tj = graph.poses[graph.edge_ij[:, 1]]
    A = pose_inverse(Ti) @ Tj
    E = pose_inverse(graph.edge_meas) @ A
    r = se3_log(E)  # [E, 6]
    Jr_inv = _inv_right_jacobian(r)
    Jj = Jr_inv
    Ji = -(Jr_inv @ _adjoint(pose_inverse(A)))
    return r, Ji, Jj


def _prior_residuals_jacobians(graph: PoseGraph):
    """Typed unary priors, both with 3-dim residuals.

    type 0 — GNSS XYZ prior: r = t_i - z, J = [R_i, 0] (right perturbation).
    Mirrors EdgeSE3PriorXYZ (edge_se3_priorxyz.hpp:14-55).

    type 1 — orientation prior: r = vec(q(R_i)) - vec(q_meas) with both
    quaternions sign-normalized to w >= 0, exactly EdgeSE3PriorQuat's
    computeError (edge_se3_priorquat.hpp:20-28). Under the right perturbation
    R <- R exp(phi^), q <- q (x) (1, phi/2), so dvec/dphi = (w I + v^)/2 —
    the analytic form of the numeric Jacobian g2o falls back to.
    """
    Ti = graph.poses[graph.prior_node]
    Ri = Ti[:, :3, :3]
    zeros33 = jnp.zeros_like(Ri)

    r_xyz = Ti[:, :3, 3] - graph.prior_xyz  # [P, 3]
    J_xyz = jnp.concatenate([Ri, zeros33], axis=-1)  # [P, 3, 6]

    from ..geom.se3 import matrix_to_quat

    q = matrix_to_quat(Ri)  # [P, 4], w >= 0 by construction
    r_quat = q[:, 1:4] - graph.prior_quat[:, 1:4]
    w = q[:, 0]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), zeros33.shape)
    Jq = 0.5 * (w[:, None, None] * eye3 + so3_hat(q[:, 1:4]))  # [P, 3, 3]
    J_quat = jnp.concatenate([zeros33, Jq], axis=-1)  # [P, 3, 6]

    isq = (graph.prior_type == 1)[:, None]
    r = jnp.where(isq, r_quat, r_xyz)
    J = jnp.where(isq[..., None], J_quat, J_xyz)
    return r, J


def _robust_weight(chi2_e, cfg: GraphOptimizerConfig):
    if cfg.robust_kernel == "huber":
        d2 = cfg.robust_delta**2
        return jnp.where(chi2_e <= d2, 1.0, jnp.sqrt(d2 / jnp.maximum(chi2_e, 1e-12)))
    return jnp.ones_like(chi2_e)


def graph_chi2(graph: PoseGraph, cfg: GraphOptimizerConfig = GraphOptimizerConfig()):
    r, _, _ = _edge_residuals_jacobians(graph)
    ce = jnp.sum(r * r * graph.edge_info, axis=-1)
    ce = ce * _robust_weight(ce, cfg) * graph.edge_valid
    rp, _ = _prior_residuals_jacobians(graph)
    cp = jnp.sum(rp * rp * graph.prior_info, axis=-1) * graph.prior_valid
    return jnp.sum(ce) + jnp.sum(cp)


def _assemble(graph: PoseGraph, cfg: GraphOptimizerConfig):
    """Blocks for the normal equations: per-edge weighted J^T Lambda J / J^T
    Lambda r, plus node masks. Shared by the dense and PCG paths."""
    n = graph.poses.shape[0]
    r, Ji, Jj = _edge_residuals_jacobians(graph)
    lam = graph.edge_info  # [E, 6] diag
    ce = jnp.sum(r * r * lam, axis=-1)
    w = _robust_weight(ce, cfg) * graph.edge_valid  # [E]

    LJi = lam[:, :, None] * Ji  # Lambda @ J  [E, 6, 6]
    LJj = lam[:, :, None] * Jj
    Hii = jnp.einsum("e,eki,ekj->eij", w, Ji, LJi)
    Hjj = jnp.einsum("e,eki,ekj->eij", w, Jj, LJj)
    Hij = jnp.einsum("e,eki,ekj->eij", w, Ji, LJj)
    bi = jnp.einsum("e,eki,ek->ei", w, Ji, lam * r)
    bj = jnp.einsum("e,eki,ek->ei", w, Jj, lam * r)

    rp, Jp = _prior_residuals_jacobians(graph)
    wp = graph.prior_valid.astype(jnp.float32)
    LJp = graph.prior_info[:, :, None] * Jp  # [P, 3, 6]
    Hp = jnp.einsum("p,pki,pkj->pij", wp, Jp, LJp)
    bp = jnp.einsum("p,pki,pk->pi", wp, Jp, graph.prior_info * rp)

    free = graph.node_valid & ~graph.node_fixed  # [N]
    return dict(
        Hii=Hii, Hjj=Hjj, Hij=Hij, bi=bi, bj=bj, Hp=Hp, bp=bp,
        i=graph.edge_ij[:, 0], j=graph.edge_ij[:, 1], pn=graph.prior_node,
        free=free, n=n,
        # raw Jacobians + weights for the matmul-form dense assembly
        Ji=Ji, Jj=Jj, w=w, lam=lam,
        Jp=Jp, wp=wp, lamp=graph.prior_info,
    )


def _diag_blocks(asm):
    """Block-diagonal of H: [N, 6, 6] via scatter."""
    n = asm["n"]
    D = jax.ops.segment_sum(asm["Hii"], asm["i"], num_segments=n)
    D = D + jax.ops.segment_sum(asm["Hjj"], asm["j"], num_segments=n)
    D = D + jax.ops.segment_sum(asm["Hp"], asm["pn"], num_segments=n)
    return D


def _gradient(asm):
    n = asm["n"]
    b = jax.ops.segment_sum(asm["bi"], asm["i"], num_segments=n)
    b = b + jax.ops.segment_sum(asm["bj"], asm["j"], num_segments=n)
    b = b + jax.ops.segment_sum(asm["bp"], asm["pn"], num_segments=n)
    return b * asm["free"][:, None]  # [N, 6]


def _matvec(asm, lam_lm, x):
    """y = (H + lam_lm * I) x without materializing H. x: [N, 6]."""
    xi = x[asm["i"]]
    xj = x[asm["j"]]
    yi = jnp.einsum("eij,ej->ei", asm["Hii"], xi) + jnp.einsum("eij,ej->ei", asm["Hij"], xj)
    yj = jnp.einsum("eij,ej->ei", asm["Hjj"], xj) + jnp.einsum("eji,ej->ei", asm["Hij"], xi)
    n = asm["n"]
    y = jax.ops.segment_sum(yi, asm["i"], num_segments=n)
    y = y + jax.ops.segment_sum(yj, asm["j"], num_segments=n)
    yp = jnp.einsum("pij,pj->pi", asm["Hp"], x[asm["pn"]])
    y = y + jax.ops.segment_sum(yp, asm["pn"], num_segments=n)
    y = y + lam_lm * x
    return y * asm["free"][:, None]


def _solve_dense(asm, lam_lm, b):
    """Materialize (H + lam I) as [6N, 6N] and Cholesky-solve (MXU path).

    Assembly is all-matmul: each edge's row block [Ji | Jj] lands in its
    node columns through a one-hot column-selection batched matmul, giving
    the stacked weighted Jacobian G [E*6, N*6]; H = G^T (w Lambda G) is then
    ONE dense MXU contraction. This replaces the previous 5-way
    `.at[r, c].add` scatter (TPU scatter lowering serializes tiny updates)
    and avoids [n, 6, n, 6] block intermediates whose minor-6 axis pads 21x
    under (8, 128) tiling."""
    n = asm["n"]
    n6 = n * 6
    cols = jnp.arange(n6, dtype=jnp.int32)
    six = jnp.arange(6, dtype=jnp.int32)

    def stacked(Jrows, nodes_per_row_block, wlam):
        """[K, R, 12or6] row blocks -> (G [K*R, N6], Gw [K*R, N6])."""
        tgt = jnp.concatenate(
            [a[:, None] * 6 + six[None, :] for a in nodes_per_row_block], axis=1
        )  # [K, 6*len(nodes)]
        S = (tgt[:, :, None] == cols[None, None, :]).astype(jnp.float32)
        G = jnp.einsum("krs,ksc->krc", Jrows, S)  # [K, R, N6]
        k, r = G.shape[0], G.shape[1]
        return G.reshape(k * r, n6), (G * wlam[:, :, None]).reshape(k * r, n6)

    J12 = jnp.concatenate([asm["Ji"], asm["Jj"]], axis=-1)  # [E, 6, 12]
    Gf, Gw = stacked(J12, (asm["i"], asm["j"]), asm["w"][:, None] * asm["lam"])
    Hm = Gf.T @ Gw
    Gpf, Gpw = stacked(asm["Jp"], (asm["pn"],), asm["wp"][:, None] * asm["lamp"])
    Hm = Hm + Gpf.T @ Gpw

    free = asm["free"].astype(jnp.float32)
    free6 = jnp.repeat(free, 6)
    Hm = Hm * free6[:, None] * free6[None, :]
    # clamped nodes + LM damping keep the system SPD
    Hm = Hm + jnp.diag(1.0 - free6) + lam_lm * jnp.eye(n6)
    rhs = (b * asm["free"][:, None]).reshape(n6)
    L = jnp.linalg.cholesky(Hm)
    x = jax.scipy.linalg.cho_solve((L, True), rhs)
    return x.reshape(n, 6)


def _solve_pcg(asm, lam_lm, b, cfg: GraphOptimizerConfig):
    """Block-Jacobi preconditioned CG on the matrix-free operator."""
    D = _diag_blocks(asm) + (lam_lm + 1e-8) * jnp.eye(6)
    Dinv = jnp.linalg.inv(D)  # [N, 6, 6]
    free = asm["free"][:, None]

    def precond(v):
        return jnp.einsum("nij,nj->ni", Dinv, v) * free

    b = b * free
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(st):
        _, r, _, _, it = st
        return (jnp.sum(r * r) / b2 > cfg.pcg_tol**2) & (it < cfg.pcg_iters)

    def body(st):
        x, r, p, rz, it = st
        Ap = _matvec(asm, lam_lm, p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, jnp.int32(0)))
    return x


def _apply_update(poses, delta, free):
    """T_i <- T_i exp(-delta_i) on free nodes (GN step solves H d = g with
    g the +gradient, so the update is the negative step)."""
    upd = se3_exp(-delta)
    newp = poses @ upd
    return jnp.where(free[:, None, None], newp, poses)


@partial(jax.jit, static_argnames=("cfg",))
def optimize_pose_graph(
    graph: PoseGraph, cfg: GraphOptimizerConfig = GraphOptimizerConfig()
) -> Tuple[PoseGraph, dict]:
    """Levenberg-Marquardt with variable lambda (g2o `lm_var` semantics,
    g2o_graph_optimizer.cpp:30-56). Returns (optimized graph, stats).

    Jitted with the config static: repeat solves at the same (max_nodes,
    max_edges) capacity reuse the compiled program — the back end re-optimizes
    the growing graph many times per run, so the retrace cost matters."""
    chi2_0 = graph_chi2(graph, cfg)

    def lm_cond(st):
        _, _, it, lam, last_chi2, done = st
        return (~done) & (it < cfg.max_iterations)

    n_nodes = graph.poses.shape[0]
    use_dense = cfg.solver == "dense" or (cfg.solver == "auto" and n_nodes * 6 <= cfg.dense_limit)

    def lm_body(st):
        poses, chi2, it, lam, _, _ = st
        g = graph.replace(poses=poses)
        asm = _assemble(g, cfg)
        b = _gradient(asm)
        if use_dense:
            delta = _solve_dense(asm, lam, b)
        else:
            delta = _solve_pcg(asm, lam, b, cfg)
        new_poses = _apply_update(poses, delta, asm["free"])
        new_chi2 = graph_chi2(graph.replace(poses=new_poses), cfg)
        accept = new_chi2 < chi2
        poses_out = jnp.where(accept, new_poses, poses)
        chi2_out = jnp.where(accept, new_chi2, chi2)
        lam_out = jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor)
        rel = jnp.abs(chi2 - chi2_out) / jnp.maximum(chi2, 1e-12)
        done = accept & (rel < cfg.chi2_rel_tol)
        done = done | (lam_out > 1e6)
        return (poses_out, chi2_out, it + 1, lam_out, chi2, done)

    init = (
        graph.poses,
        chi2_0,
        jnp.int32(0),
        jnp.float32(cfg.lm_lambda_init),
        chi2_0,
        jnp.bool_(False),
    )
    poses, chi2, iters, lam, _, _ = jax.lax.while_loop(lm_cond, lm_body, init)
    stats = {"chi2_before": chi2_0, "chi2_after": chi2, "iterations": iters, "lambda": lam}
    return graph.replace(poses=poses), stats


def _grow(arr: np.ndarray, fill=None) -> np.ndarray:
    """Double an array's leading dimension (device shapes recompile once per
    doubling — bounded log2(N) recompiles instead of a mid-run crash)."""
    n = arr.shape[0]
    out = np.zeros((2 * n,) + arr.shape[1:], arr.dtype)
    out[:n] = arr
    if fill is not None:
        out[n:] = fill
    return out


class PoseGraphBuilder:
    """Host-side incremental builder mirroring the G2oGraphOptimizer API
    (AddSe3Node / AddSe3Edge / AddSe3PriorXYZEdge / AddSe3PriorQuaternionEdge
    / Optimize). Capacities grow by doubling when exceeded."""

    def __init__(self, max_nodes: int = 2048, max_edges: int = 4096, max_priors: int = 2048):
        self.max_nodes = max_nodes
        self.max_edges = max_edges
        self.max_priors = max_priors
        self._poses = np.tile(np.eye(4, dtype=np.float32), (max_nodes, 1, 1))
        self._node_valid = np.zeros(max_nodes, bool)
        self._node_fixed = np.zeros(max_nodes, bool)
        self._edge_ij = np.zeros((max_edges, 2), np.int32)
        self._edge_meas = np.tile(np.eye(4, dtype=np.float32), (max_edges, 1, 1))
        self._edge_info = np.ones((max_edges, 6), np.float32)
        self._edge_valid = np.zeros(max_edges, bool)
        self._prior_node = np.zeros(max_priors, np.int32)
        self._prior_xyz = np.zeros((max_priors, 3), np.float32)
        self._prior_info = np.ones((max_priors, 3), np.float32)
        self._prior_valid = np.zeros(max_priors, bool)
        self._prior_quat = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (max_priors, 1))
        self._prior_type = np.zeros(max_priors, np.int32)
        self.n_nodes = 0
        self.n_edges = 0
        self.n_priors = 0

    def _ensure_node(self):
        if self.n_nodes >= self.max_nodes:
            self._poses = _grow(self._poses, np.eye(4, dtype=np.float32))
            self._node_valid = _grow(self._node_valid)
            self._node_fixed = _grow(self._node_fixed)
            self.max_nodes *= 2

    def _ensure_edge(self):
        if self.n_edges >= self.max_edges:
            self._edge_ij = _grow(self._edge_ij)
            self._edge_meas = _grow(self._edge_meas, np.eye(4, dtype=np.float32))
            self._edge_info = _grow(self._edge_info, 1.0)
            self._edge_valid = _grow(self._edge_valid)
            self.max_edges *= 2

    def _ensure_prior(self):
        if self.n_priors >= self.max_priors:
            self._prior_node = _grow(self._prior_node)
            self._prior_xyz = _grow(self._prior_xyz)
            self._prior_info = _grow(self._prior_info, 1.0)
            self._prior_valid = _grow(self._prior_valid)
            self._prior_quat = _grow(self._prior_quat, np.asarray([1.0, 0, 0, 0], np.float32))
            self._prior_type = _grow(self._prior_type)
            self.max_priors *= 2

    def add_se3_node(self, pose, fixed: bool = False) -> int:
        self._ensure_node()
        i = self.n_nodes
        self._poses[i] = np.asarray(pose, np.float32)
        self._node_valid[i] = True
        self._node_fixed[i] = fixed
        self.n_nodes += 1
        return i

    def add_se3_edge(self, i: int, j: int, measurement, noise=None) -> None:
        """`noise` is the per-DOF sigma vector; information = 1/noise as in
        CalculateSe3EdgeInformationMatrix (g2o_graph_optimizer.cpp:142-150)."""
        self._ensure_edge()
        e = self.n_edges
        self._edge_ij[e] = (i, j)
        self._edge_meas[e] = np.asarray(measurement, np.float32)
        if noise is not None:
            self._edge_info[e] = 1.0 / np.asarray(noise, np.float32)
        self._edge_valid[e] = True
        self.n_edges += 1

    def add_se3_prior_xyz_edge(self, node: int, xyz, noise=None) -> None:
        self._ensure_prior()
        p = self.n_priors
        self._prior_node[p] = node
        self._prior_xyz[p] = np.asarray(xyz, np.float32)
        if noise is not None:
            self._prior_info[p] = 1.0 / np.asarray(noise, np.float32)
        self._prior_valid[p] = True
        self._prior_type[p] = 0
        self.n_priors += 1

    def add_se3_prior_quat_edge(self, node: int, quat_wxyz, noise=None) -> None:
        """Orientation prior (AddSe3PriorQuaternionEdge,
        g2o_graph_optimizer.cpp:152-174 / edge_se3_priorquat.hpp:14-60).
        `quat_wxyz` is (w, x, y, z); sign-normalized to w >= 0 exactly as
        setMeasurement does. `noise` is the 3-vector of residual sigmas."""
        self._ensure_prior()
        p = self.n_priors
        q = np.asarray(quat_wxyz, np.float32)
        q = q / max(np.linalg.norm(q), 1e-12)
        if q[0] < 0.0:
            q = -q
        self._prior_node[p] = node
        self._prior_quat[p] = q
        if noise is not None:
            self._prior_info[p] = 1.0 / np.asarray(noise, np.float32)
        self._prior_valid[p] = True
        self._prior_type[p] = 1
        self.n_priors += 1

    def to_graph(self) -> PoseGraph:
        return PoseGraph(
            poses=jnp.asarray(self._poses),
            node_valid=jnp.asarray(self._node_valid),
            node_fixed=jnp.asarray(self._node_fixed),
            edge_ij=jnp.asarray(self._edge_ij),
            edge_meas=jnp.asarray(self._edge_meas),
            edge_info=jnp.asarray(self._edge_info),
            edge_valid=jnp.asarray(self._edge_valid),
            prior_node=jnp.asarray(self._prior_node),
            prior_xyz=jnp.asarray(self._prior_xyz),
            prior_info=jnp.asarray(self._prior_info),
            prior_valid=jnp.asarray(self._prior_valid),
            prior_quat=jnp.asarray(self._prior_quat),
            prior_type=jnp.asarray(self._prior_type),
        )

    def optimize(self, cfg: GraphOptimizerConfig = GraphOptimizerConfig()):
        graph, stats = optimize_pose_graph(self.to_graph(), cfg)
        self._poses[: self.n_nodes] = np.asarray(graph.poses)[: self.n_nodes]
        return graph, stats

    def get_pose(self, i: int) -> np.ndarray:
        return self._poses[i].copy()
