"""TPU-native NDT registration with per-voxel static weights.

Re-design of the reference's flagship kernel — the manual Normal
Distributions Transform (Magnusson 2009) with static-point weighting
(src/models/registration/ndt_registration_manual/NormalDistributionsTransform.cpp:14-978
and VoxelGrid.cpp:17-811) — as pure, statically-shaped JAX:

- The voxel Gaussian map is a dense regular grid built in one shot with
  `segment_sum` scatters + a batched closed-form 3x3 eigendecomposition for
  covariance conditioning (replacing the per-voxel CPU loop of
  VoxelGrid::computeCentroidAndCovariance, VoxelGrid.cpp:272-325).
- Voxel neighbourhood lookup is a static 3x3x3 stencil gather with a true
  `|centroid - x'| <= resolution` distance gate — provably equivalent to the
  reference's `radiusSearch(x', resolution)` over voxel centroids
  (VoxelGrid.cpp:432-480) because a centroid lies inside its own cell, so no
  in-radius centroid can be more than one cell away. The octree
  (Octree.cpp) has no TPU equivalent and is not needed.
- Score / gradient / Hessian accumulation vectorizes Magnusson's analytic
  angle Jacobians and Hessians (computeAngleDerivatives,
  NormalDistributionsTransform.cpp:523-645) into three small constant
  tensors per iteration; the per-(point, voxel) reduction is batched einsums
  chunked over points.
- The Newton iteration with More-Thuente line search
  (computeStepLengthMT, :648-756) is a bounded `lax.while_loop`.

Reference quirks handled explicitly:
- The reference multiplies the static weight into the *score* only, not into
  the gradient/Hessian (NormalDistributionsTransform.cpp:436-441);
  `NDTConfig.weight_derivatives=True` (our default) also weights the
  derivatives, which is the principled version of the feature. Set it False
  for reference-compatible behaviour.
- The reference's line-search loop is dead code: `interval_converged` is
  initialized `(step_max - step_min) > 0` (= true) so zero More-Thuente
  iterations ever run and the accepted step is simply the Newton step
  clamped to [eps/2, step_size] (NormalDistributionsTransform.cpp:682-756;
  upstream PCL uses `< 0`). `NDTConfig.max_step_iterations=0` (default)
  reproduces that effective behaviour; >0 enables the real More-Thuente
  search.

Pose parameterization matches the reference: p = (tx, ty, tz, roll, pitch,
yaw) with R = Rx(roll) Ry(pitch) Rz(yaw) (Eigen eulerAngles(0,1,2)).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ...geom.se3 import euler_xyz_to_matrix, matrix_to_euler_xyz, make_pose
from ...ops.eigh3 import sym_eigh3
from ...ops.pointcloud import PointCloud


@dataclasses.dataclass(frozen=True)
class NDTConfig:
    """Static NDT parameters (hashable; safe as a jit static argument).

    Defaults mirror config/mapping/front_end.yaml:1-66 and the manual NDT
    constructor (NormalDistributionsTransform.cpp:14-35).
    """

    resolution: float = 1.0
    step_size: float = 0.1
    trans_eps: float = 0.01
    max_iter: int = 30
    outlier_ratio: float = 0.55
    min_points_per_voxel: int = 6
    grid_dims: Tuple[int, int, int] = (256, 256, 64)
    # capacity of the compact occupied-voxel table (dense grids are ~99.9%
    # empty; the hot kernel gathers 4 B indices from the dense grid and 64 B
    # stats from this small table — ~10x less HBM gather traffic than
    # gathering stats rows from the dense grid directly)
    max_compact_voxels: int = 65536
    # Neighbourhood mode: 'radius27' = 3x3x3 stencil with the reference's
    # |centroid - x'| <= resolution gate (radiusSearch semantics);
    # 'direct7' = centre + 6 face neighbours, ungated (the pclomp-style fast
    # mode: ~4x fewer gathers per point).
    stencil: str = "radius27"
    # stats fetch: 'two_level' = int32 index gather + packed-row gather
    # (XLA); 'onehot' = Pallas one-hot MXU selection for the fetch stage
    # only (derivative math stays XLA; measured slower than two_level);
    # 'fused' = the full Pallas kernel (ops/pallas/ndt_fused.py): one-hot
    # MXU selection + the whole score/grad/Hessian reduction in VMEM, no
    # gathers and no HBM intermediates. 'fused' cost scales with
    # max_compact_voxels (the one-hot domain is windowed, so capacity only
    # costs VMEM residency — 65536 measured within 10% of 8192).
    # 'auto' = 'fused' when a TPU backend is present, else 'two_level'
    # (keeps CPU tests on the fast XLA path instead of the Pallas
    # interpreter). Pipeline configs default to 'auto'.
    gather: str = "two_level"
    # materialize the dense per-voxel stats views (mean/icov/valid over the
    # full grid) at map-finalize time. The ALIGN path reads only the compact
    # packed table; the dense views serve ndt_fitness_score and inspection.
    # False skips them (1-element placeholders) — the [V, 3, 3] scatter-back
    # dominates finalize cost at multi-million-voxel grids, and the front
    # end's tracking maps never consume it.
    dense_stats: bool = True
    # key-window width for gather='fused': per point tile the kernel only
    # compares/contracts against this many sorted keys around the tile's
    # voxel-id range. Must cover the worst-case occupied-key count within
    # one x-neighbour span (+/- dims[1]*dims[2] voxel ids) — the kernel
    # reports an `unresolved` count if it ever doesn't (checked in tests).
    fused_window: int = 2048
    # points per fused-kernel grid step; must be a multiple of 1024 (the
    # kernel splits each tile into 8 sublane groups of tile/8 >= 128 lanes)
    fused_tile: int = 1024
    weight_derivatives: bool = True
    # More-Thuente step-length iterations. 0 (default) reproduces the
    # reference's effective behaviour (its loop is dead code — see module
    # docstring): Newton steps clamped to [eps/2, step_size]. >0 enables the
    # real line search — measured 7 vs 60+ iterations to converge at res
    # 0.5 with tighter error, but it can also lock onto step_min on
    # indefinite-Hessian iterations and stop early on sparse maps, so it is
    # opt-in per use site (e.g. fine-resolution refinement passes).
    max_step_iterations: int = 0
    # 'newton' = the reference's clamped-Newton iteration (step length
    # limited to step_size = 0.1 m). 'lm' = Levenberg-Marquardt on -score
    # with full damped-Newton trial steps and accept/reject. Round-3 TPU
    # measurement at the production operating point (corridor bench,
    # 0.3 m-perturbed guesses): newton converges to 0.016 m mean error in
    # ~20 evals; lm stalls against its step-acceptance test on aliased
    # corridor scenes (29 evals, 0.15 m mean error) — newton is the
    # production default, lm stays for well-conditioned fine-refinement use.
    # NOTE: with the motion-model-chained guesses production actually uses
    # (front_end.cpp:238-240), newton needs only ~3.5 evals/frame — the
    # iteration count is dominated by the first frame's cold start.
    solver: str = "newton"
    # stop when the score stops improving: |dscore| < score_rel_tol * |score|
    # after >= 3 iterations. Default 0 (off, reference-exact behaviour).
    # Round-2 notes reported a TPU compiler hang with this enabled; round-3
    # re-measurement (2026-08-20 toolchain) shows it compiles and runs fine.
    # At production operating points it is nearly moot: with motion-model
    # prediction the solver converges by the |step| < trans_eps test in ~3
    # iterations before a plateau can trigger.
    score_rel_tol: float = 0.0
    point_chunk: int = 8192

    def resolve_gather(self) -> str:
        if self.gather == "auto":
            from ...ops.pallas.ndt_reduce import pallas_supported

            return "fused" if pallas_supported() else "two_level"
        return self.gather

    def gauss_params(self) -> Tuple[float, float]:
        """Gaussian-mixture d1/d2 (eq. 6.8, Magnusson 2009) as in
        NormalDistributionsTransform.cpp:316-321."""
        c1 = 10.0 * (1.0 - self.outlier_ratio)
        c2 = self.outlier_ratio / (self.resolution**3)
        d3 = -math.log(c2)
        d1 = -math.log(c1 + c2) - d3
        d2 = -2.0 * math.log((-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1)
        return d1, d2


@flax.struct.dataclass
class NDTMap:
    """Dense voxel-Gaussian map (the reference's VoxelGrid, without pointers).

    `packed` carries every per-voxel statistic the derivative kernel reads in
    ONE gather-friendly [V, 16] row (64 B, aligned):
      [0:3] mean, [3] staticvalue, [4:10] icov upper triangle
      (xx, xy, xz, yy, yz, zz), [10] valid (0/1), [11] count, [12:16] pad.
    Four separate gathers from a multi-million-voxel table dominated the
    runtime on TPU; one packed row per stencil slot is ~4x cheaper.
    """

    origin: jax.Array  # [3] grid min corner (metres)
    count: jax.Array  # [V] float32 points per voxel (0 for empty)
    mean: jax.Array  # [V, 3]
    icov: jax.Array  # [V, 3, 3] conditioned inverse covariance
    staticvalue: jax.Array  # [V] mean static weight per voxel
    valid: jax.Array  # [V] bool: enough points & non-degenerate covariance
    index: jax.Array  # [V] int32 -> row in `packed` (sentinel = last row)
    packed: jax.Array  # [C+1, 16] compact stats; last row is the zero sentinel
    keys: jax.Array  # [C+1] int32 flat voxel id per compact row (-1 unused)
    dims: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    resolution: float = flax.struct.field(pytree_node=False, default=1.0)


@flax.struct.dataclass
class NDTResult:
    pose: jax.Array  # [4, 4] final transform
    trans_probability: jax.Array  # score / n_valid_points
    score: jax.Array
    iterations: jax.Array
    converged: jax.Array
    gradient: jax.Array  # [6] at the solution
    hessian: jax.Array  # [6, 6] at the solution
    # max over iterations of the fused kernel's exactness guard: > 0 means
    # some derivative terms fell outside the key window and were dropped —
    # widen NDTConfig.fused_window or use gather='two_level'. Always 0 on
    # the XLA path. Production callers should check this (it is a cheap
    # scalar): the front end falls back to the exact XLA path when it fires
    # (pipeline/front_end.py), and bench.py asserts unresolved == 0 across
    # all fused frames before printing its result.
    unresolved: jax.Array = 0.0


def _flat_vid(coords, dims):
    return (coords[..., 0] * dims[1] + coords[..., 1]) * dims[2] + coords[..., 2]


@flax.struct.dataclass
class NDTMapSums:
    """Running per-voxel moment sums — the incremental form of the NDT map.

    TPU-native equivalent of the reference's incremental VoxelGrid::update
    (VoxelGrid.cpp:545-809): instead of growing boundaries and re-indexing a
    pointer-based voxel list, we keep dense per-voxel running sums on a fixed
    lattice and support three O(V)-elementwise operations:

      scatter_to_sums(sums, pts, sign=+1/-1)  add / evict a cloud
      recenter_ndt_sums(sums, new_origin)     shift the window (roll + zero)
      finalize_ndt_sums(sums, config)         conditioned Gaussians -> NDTMap

    Second moments are accumulated relative to each point's OWN voxel corner
    (coords in [0, res)), so float32 sums never exceed ~res^2 * count: no
    catastrophic cancellation for maps far from the world origin, and the
    sums are completely independent of `origin` (the corner lattice is
    absolute), which makes recentering an exact integer roll.

    Voxel assignment is computed on the ABSOLUTE lattice (floor(p / res) -
    origin/res) rather than floor((p - origin) / res): the two agree in
    exact arithmetic for lattice-multiple origins, but only the former
    guarantees a point scatters to the same voxel on add and on evict after
    the window recentred in between (float rounding at cell boundaries).
    `origin` must be (and is, at every internal call site) a multiple of
    `resolution`.
    """

    origin: jax.Array  # [3] grid min corner; always a multiple of resolution
    count: jax.Array  # [V] float32 points per voxel (exact integers)
    psum: jax.Array  # [V, 3] sum of (p - voxel corner)
    ppsum: jax.Array  # [V, 6] sym sum of outer((p - corner)): xx, xy, xz, yy, yz, zz
    wsum: jax.Array  # [V] sum of static weights
    dims: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    resolution: float = flax.struct.field(pytree_node=False, default=1.0)


def empty_ndt_sums(origin, config: NDTConfig) -> NDTMapSums:
    dims = config.grid_dims
    v = dims[0] * dims[1] * dims[2]
    return NDTMapSums(
        origin=jnp.asarray(origin, jnp.float32),
        count=jnp.zeros((v,), jnp.float32),
        psum=jnp.zeros((v, 3), jnp.float32),
        ppsum=jnp.zeros((v, 6), jnp.float32),
        wsum=jnp.zeros((v,), jnp.float32),
        dims=dims,
        resolution=config.resolution,
    )


def scatter_to_sums(
    sums: NDTMapSums, points, mask, weights=None, sign: float = 1.0, signs=None
) -> NDTMapSums:
    """Accumulate (sign=+1) or remove (sign=-1) a cloud's voxel moments.

    Eviction with sign=-1 is exact for `count` (integer adds in float32) and
    reproducible to float32 rounding for the moment sums; out-of-bounds
    points are skipped symmetrically on add and evict, so a window that
    recentres between add and evict stays consistent (dropped cells were
    zeroed by the roll; their points are out of bounds at evict time).

    `signs` ([N] float32, ±1) overrides the scalar `sign` per point, so one
    concatenated evict+add cloud needs ONE segment_sum pass over the dense
    [V]-sized outputs instead of two (the output traffic, not the point
    count, dominates this op at multi-million-voxel grids).
    """
    dims = sums.dims
    v = dims[0] * dims[1] * dims[2]
    res = jnp.float32(sums.resolution)
    pts = points
    if weights is None:
        weights = jnp.ones(pts.shape[:-1], jnp.float32)

    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    safe_pts = jnp.where(finite[:, None], pts, 0.0)
    # absolute-lattice cell, then shift by the (integer) origin cell — see
    # class docstring for why this is not floor((p - origin) / res)
    cell_abs = jnp.floor(safe_pts / res).astype(jnp.int32)
    origin_cells = jnp.round(sums.origin / res).astype(jnp.int32)
    coords = cell_abs - origin_cells
    inb = jnp.all((coords >= 0) & (coords < jnp.asarray(dims, jnp.int32)), axis=-1)
    ok = mask & inb & finite
    vid = jnp.where(ok, _flat_vid(coords, dims), 0)
    s = jnp.asarray(signs, jnp.float32) if signs is not None else jnp.float32(sign)
    okf = ok.astype(jnp.float32) * s

    # voxel-corner-relative coordinates in [0, res)
    rel = safe_pts - cell_abs.astype(jnp.float32) * res
    rel = jnp.where(ok[:, None], rel, 0.0)
    rx, ry, rz = rel[:, 0], rel[:, 1], rel[:, 2]
    outer6 = jnp.stack([rx * rx, rx * ry, rx * rz, ry * ry, ry * rz, rz * rz], axis=-1)

    return sums.replace(
        count=sums.count + jax.ops.segment_sum(okf, vid, num_segments=v),
        psum=sums.psum + jax.ops.segment_sum(rel * okf[:, None], vid, num_segments=v),
        ppsum=sums.ppsum + jax.ops.segment_sum(outer6 * okf[:, None], vid, num_segments=v),
        wsum=sums.wsum + jax.ops.segment_sum(weights * okf, vid, num_segments=v),
    )


def coarsen_ndt_sums(sums: NDTMapSums) -> NDTMapSums:
    """Derive the 2x-resolution sums from the fine sums in one dense pass.

    The coarse tracking grid the front end aligns against first
    (coarse-to-fine) used to be maintained independently — its own scatter,
    evict and roll per keyframe. But every coarse voxel is exactly a 2x2x2
    block of fine voxels, and the corner-relative moment sums transform in
    closed form under the corner shift d = fine_corner - coarse_corner
    (d in {0, res}^3, given by the fine cell's parity):

        count' = count                 psum' = psum + count * d
        ppsum' = ppsum + d psum^T + psum d^T + count d d^T

    so the whole coarse grid is an elementwise shift + 2x2x2 block reduce
    over the fine arrays (~1 ms at 4.2M voxels) instead of a second
    scatter/evict/roll pipeline. REQUIRES the fine origin to be on the
    coarse (2*res) lattice so block boundaries match absolute coarse
    voxels — the front end snaps tracking-map origins accordingly.
    """
    d0, d1, d2 = sums.dims
    assert d0 % 2 == 0 and d1 % 2 == 0 and d2 % 2 == 0
    r = jnp.float32(sums.resolution)

    # The z (minor/lane) pair-reduction as an MXU matmul — a strided
    # minor-dim reduce lowers to lane shuffles and measured ~15x slower.
    # P sums z pairs; Pw sums only the odd-z (dz = res) member.
    zi = jnp.arange(d2)
    P = jnp.zeros((d2, d2 // 2), jnp.float32).at[zi, zi // 2].set(1.0)
    Pw = jnp.zeros((d2, d2 // 2), jnp.float32).at[zi, zi // 2].set(
        (zi % 2).astype(jnp.float32)
    )

    def g(a):
        return a.reshape(d0, d1, d2)

    def zred(a):
        return g(a) @ P

    def zredw(a):
        return g(a) @ Pw

    cnt, ws = sums.count, sums.wsum
    px, py, pz = sums.psum[:, 0], sums.psum[:, 1], sums.psum[:, 2]
    xx, xy, xz = sums.ppsum[:, 0], sums.ppsum[:, 1], sums.ppsum[:, 2]
    yy, yz, zz = sums.ppsum[:, 3], sums.ppsum[:, 4], sums.ppsum[:, 5]

    C, Cw = zred(cnt), zredw(cnt)
    PX, PY, PZ = zred(px), zred(py), zred(pz)
    # z-shift folded at the z stage: X' = X + dz * Y sums to zred(X) + r*zredw(Y)
    PZs = PZ + r * Cw  # pz' z-stage
    XZs = zred(xz) + r * zredw(px)
    YZs = zred(yz) + r * zredw(py)
    ZZs = zred(zz) + 2.0 * r * zredw(pz) + r * r * Cw
    XXz, XYz, YYz, Wz = zred(xx), zred(xy), zred(yy), zred(ws)

    # x/y pair-reduction by major-axis even/odd slicing, with the x/y shift
    # terms (dx = ox*r, dy = oy*r) applied per parity slice
    def s4(a):
        return (a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2])

    C4, Cw4 = s4(C), s4(Cw)
    PX4, PY4, PZ4 = s4(PX), s4(PY), s4(PZ)
    OX = (0.0, 0.0, 1.0, 1.0)  # x parity per s4 slice
    OY = (0.0, 1.0, 0.0, 1.0)

    def red(z4, extra=lambda i: 0.0):
        out = 0.0
        for i in range(4):
            out = out + z4[i] + extra(i)
        return out

    cnt_c = red(s4(C))
    ws_c = red(s4(Wz))
    px_c = red(s4(PX), lambda i: OX[i] * r * C4[i])
    py_c = red(s4(PY), lambda i: OY[i] * r * C4[i])
    pz_c = red(s4(PZs))
    xx_c = red(s4(XXz), lambda i: OX[i] * (2.0 * r * PX4[i] + r * r * C4[i]))
    yy_c = red(s4(YYz), lambda i: OY[i] * (2.0 * r * PY4[i] + r * r * C4[i]))
    xy_c = red(
        s4(XYz),
        lambda i: OX[i] * r * PY4[i] + OY[i] * r * PX4[i] + OX[i] * OY[i] * r * r * C4[i],
    )
    xz_c = red(s4(XZs), lambda i: OX[i] * r * (PZ4[i] + r * Cw4[i]))
    yz_c = red(s4(YZs), lambda i: OY[i] * r * (PZ4[i] + r * Cw4[i]))
    zz_c = red(s4(ZZs))

    return NDTMapSums(
        origin=sums.origin,
        count=cnt_c.reshape(-1),
        psum=jnp.stack([px_c, py_c, pz_c], axis=-1).reshape(-1, 3),
        ppsum=jnp.stack([xx_c, xy_c, xz_c, yy_c, yz_c, zz_c], axis=-1).reshape(-1, 6),
        wsum=ws_c.reshape(-1),
        dims=(d0 // 2, d1 // 2, d2 // 2),
        resolution=float(sums.resolution) * 2.0,
    )


def recenter_ndt_sums(sums: NDTMapSums, new_origin) -> NDTMapSums:
    """Shift the window to a new origin (a lattice multiple): roll the dense
    arrays by the integer cell offset and zero the cells that wrapped — the
    TPU equivalent of VoxelGrid::updateBoundaries (VoxelGrid.cpp:604-700).
    Works under jit with a traced new_origin (dynamic roll + iota masks)."""
    dims = sums.dims
    res = jnp.float32(sums.resolution)
    new_origin = jnp.asarray(new_origin, jnp.float32)
    shift = jnp.round((new_origin - sums.origin) / res).astype(jnp.int32)  # [3]

    # new[i] = old[i + shift]; valid where 0 <= i + shift < dims
    masks = []
    for ax in range(3):
        ix = jnp.arange(dims[ax], dtype=jnp.int32)
        masks.append((ix + shift[ax] >= 0) & (ix + shift[ax] < dims[ax]))
    keep = (masks[0][:, None, None] & masks[1][None, :, None] & masks[2][None, None, :])

    def shift_dense(a):
        g = a.reshape(dims[0], dims[1], dims[2], -1)
        g = jnp.roll(g, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
        g = jnp.where(keep[..., None], g, 0.0)
        return g.reshape(a.shape)

    return sums.replace(
        origin=new_origin,
        count=shift_dense(sums.count),
        psum=shift_dense(sums.psum),
        ppsum=shift_dense(sums.ppsum),
        wsum=shift_dense(sums.wsum),
    )


def _moments_from_sums(
    origin, count_raw, psum, ppsum, wsum, dims, resolution: float, vid_start=0
):
    """Per-voxel (count, mean, cov, staticvalue) from running moment sums —
    strictly elementwise, so it runs unchanged on a voxel SLAB when given
    that slab's arrays and its starting flat voxel id (`vid_start`); the
    sharded map build (parallel/sharded_ndt.py) relies on this."""
    v = count_raw.shape[0]
    res = jnp.float32(resolution)
    # guard against float residue after add/evict cycles: a voxel is only a
    # Gaussian with >= min_points_per_voxel anyway, and count is exact for
    # true integer contents
    count = jnp.maximum(count_raw, 0.0)
    count = jnp.where(count < 0.5, 0.0, count)

    n = jnp.maximum(count, 1.0)
    rel_mean = psum / n[:, None]
    # absolute voxel corner from the flat id (absolute-lattice convention,
    # matching scatter_to_sums: corner = (origin_cell + local_cell) * res)
    idx = vid_start + jnp.arange(v, dtype=jnp.int32)
    cz = idx % dims[2]
    cy = (idx // dims[2]) % dims[1]
    cx = idx // (dims[1] * dims[2])
    origin_cells = jnp.round(origin / res).astype(jnp.int32)
    corner = (
        origin_cells[None, :] + jnp.stack([cx, cy, cz], axis=-1)
    ).astype(jnp.float32) * res
    mean = corner + rel_mean
    staticvalue = wsum / n
    # cov = (sum rr^T / n - mu_rel mu_rel^T) * (n-1)/n  (VoxelGrid.cpp:292-295)
    pp = ppsum / n[:, None]
    cov = jnp.stack(
        [
            pp[:, 0] - rel_mean[:, 0] * rel_mean[:, 0],
            pp[:, 1] - rel_mean[:, 0] * rel_mean[:, 1],
            pp[:, 2] - rel_mean[:, 0] * rel_mean[:, 2],
            pp[:, 1] - rel_mean[:, 0] * rel_mean[:, 1],
            pp[:, 3] - rel_mean[:, 1] * rel_mean[:, 1],
            pp[:, 4] - rel_mean[:, 1] * rel_mean[:, 2],
            pp[:, 2] - rel_mean[:, 0] * rel_mean[:, 2],
            pp[:, 4] - rel_mean[:, 1] * rel_mean[:, 2],
            pp[:, 5] - rel_mean[:, 2] * rel_mean[:, 2],
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    cov = cov * ((n - 1.0) / n)[:, None, None]
    return count, mean, cov, staticvalue


def finalize_ndt_sums(sums: NDTMapSums, config: NDTConfig) -> NDTMap:
    """Condition the running sums into an NDTMap (centroid + clamped-inverse
    covariance + compact packed table) — the second half of
    VoxelGrid::computeCentroidAndCovariance (VoxelGrid.cpp:272-325).

    Compact-first all the way from the SUMS: the dense stages are one count
    clean-up, one cumsum, the (fitness-consumed) dense mean, and cheap
    scatters — the second moments, covariance, and eigendecomposition touch
    only the <=max_compact_voxels gathered rows. Avoids materializing the
    [V, 3, 3] dense covariance (~150 MB at KITTI grids) entirely; this runs
    once per keyframe on the incremental-map path."""
    dims = sums.dims
    v = dims[0] * dims[1] * dims[2]
    res = jnp.float32(sums.resolution)
    cap = config.max_compact_voxels

    count = jnp.maximum(sums.count, 0.0)
    count = jnp.where(count < 0.5, 0.0, count)
    n = jnp.maximum(count, 1.0)
    idx = jnp.arange(v, dtype=jnp.int32)
    origin_cells = jnp.round(sums.origin / res).astype(jnp.int32)

    def corner_of(vid):
        cz = vid % dims[2]
        cy = (vid // dims[2]) % dims[1]
        cx = vid // (dims[1] * dims[2])
        return (
            origin_cells[None, :] + jnp.stack([cx, cy, cz], axis=-1)
        ).astype(jnp.float32) * res

    if config.dense_stats:
        # dense mean: consumed by ndt_fitness_score's nearest-centroid search
        mean = corner_of(idx) + sums.psum / n[:, None]
        staticvalue = sums.wsum / n
    else:
        mean = jnp.zeros((1, 3), jnp.float32)
        staticvalue = jnp.zeros((1,), jnp.float32)

    occupied = count >= float(config.min_points_per_voxel)
    csum = jnp.cumsum(occupied.astype(jnp.int32))  # [V] inclusive
    pos = csum - 1
    in_cap = occupied & (pos < cap)
    index = jnp.where(in_cap, pos, cap).astype(jnp.int32)
    # keys[j] = flat vid of the j-th occupied voxel = first vid whose
    # inclusive cumsum reaches j+1. searchsorted (65k queries x log2 V
    # gathers) measured ~2x faster than the [V]-update scatter it replaces
    # (the scatter walks all 4.19M updates; this touches ~1.4M gathers) —
    # this runs once per keyframe on the incremental tracking-map path.
    j = jnp.arange(cap + 1, dtype=jnp.int32)
    total = jnp.minimum(csum[-1], cap)
    keys = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
    keys = jnp.where(j < total, keys, -1)
    chas = keys >= 0
    cvid = jnp.maximum(keys, 0)

    # compact moments from the gathered raw sums ([cap+1] rows only)
    c_count = jnp.where(chas, count[cvid], 0.0)
    c_n = jnp.maximum(c_count, 1.0)
    c_rel = sums.psum[cvid] / c_n[:, None]
    c_pp = sums.ppsum[cvid] / c_n[:, None]
    c_cov = jnp.stack(
        [
            c_pp[:, 0] - c_rel[:, 0] * c_rel[:, 0],
            c_pp[:, 1] - c_rel[:, 0] * c_rel[:, 1],
            c_pp[:, 2] - c_rel[:, 0] * c_rel[:, 2],
            c_pp[:, 1] - c_rel[:, 0] * c_rel[:, 1],
            c_pp[:, 3] - c_rel[:, 1] * c_rel[:, 1],
            c_pp[:, 4] - c_rel[:, 1] * c_rel[:, 2],
            c_pp[:, 2] - c_rel[:, 0] * c_rel[:, 2],
            c_pp[:, 4] - c_rel[:, 1] * c_rel[:, 2],
            c_pp[:, 5] - c_rel[:, 2] * c_rel[:, 2],
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    c_cov = c_cov * ((c_n - 1.0) / c_n)[:, None, None]
    c_mean = jnp.where(chas[:, None], corner_of(cvid) + c_rel, 0.0)
    c_sv = jnp.where(chas, sums.wsum[cvid] / c_n, 0.0)

    c_rows, c_icov, c_valid = _condition_rows(c_count, c_mean, c_cov, c_sv, config)
    c_valid = c_valid & chas
    c_rows = jnp.where(chas[:, None], c_rows, 0.0)
    c_rows = c_rows.at[:, 10].set(c_valid.astype(jnp.float32))
    c_rows = c_rows.at[cap].set(0.0)  # zero sentinel row (valid flag = 0)
    c_icov = jnp.where(c_valid[:, None, None], c_icov, 0.0)

    if config.dense_stats:
        # sentinel rows (keys == -1) scatter to the out-of-range index v so
        # mode="drop" discards them; clamping them to 0 instead could
        # nondeterministically clobber an occupied voxel 0 (duplicate-index
        # scatter order is unspecified)
        svid = jnp.where(chas, cvid, v)
        icov = jnp.zeros((v, 3, 3), jnp.float32).at[svid].set(c_icov, mode="drop")
        valid = jnp.zeros((v,), bool).at[svid].set(c_valid, mode="drop")
    else:
        icov = jnp.zeros((1, 3, 3), jnp.float32)
        valid = jnp.zeros((1,), bool)
    return NDTMap(
        origin=sums.origin,
        count=count,
        mean=mean,
        icov=icov,
        staticvalue=staticvalue,
        valid=valid,
        index=index,
        packed=c_rows,
        keys=keys,
        dims=dims,
        resolution=config.resolution,
    )


def build_ndt_map(cloud: PointCloud, config: NDTConfig, origin=None) -> NDTMap:
    """Scatter a target cloud into per-voxel Gaussians.

    Equivalent of VoxelGrid::setInput -> scatterPointsToVoxelGrid ->
    computeCentroidAndCovariance (VoxelGrid.cpp:244-325), fully vectorized.
    Points outside origin + dims*resolution are dropped. Implemented as
    empty sums + one scatter + finalize, so an incrementally-maintained
    NDTMapSums (see scatter_to_sums) yields bit-comparable maps.
    """
    res = jnp.float32(config.resolution)
    pts = cloud.points
    mask = cloud.mask

    if origin is None:
        big = jnp.float32(1e9)
        mn = jnp.min(jnp.where(mask[:, None], pts, big), axis=0)
        # snap to the voxel lattice with one cell of margin
        origin = jnp.floor(mn / res - 1.0) * res

    sums = empty_ndt_sums(origin, config)
    sums = scatter_to_sums(sums, pts, mask, cloud.get_weights())
    return finalize_ndt_sums(sums, config)


def _condition_rows(count, mean, cov, staticvalue, config: NDTConfig):
    """Per-voxel covariance conditioning -> (rows [V, 16], icov, valid).

    Strictly elementwise over the voxel axis, so it shards cleanly over
    voxel slabs (parallel/sharded_ndt.sharded_build_ndt_map) — this is where
    the map-build FLOPs live (batched eigendecomposition + inverse)."""
    v = count.shape[0]
    evals, evecs = sym_eigh3(cov)
    enough = count >= float(config.min_points_per_voxel)
    # Reference marks voxels with negative / zero eigenvalues degenerate
    # (points_per_voxel = -1, VoxelGrid.cpp:303-306).
    nondegen = (evals[:, 0] >= 0.0) & (evals[:, 2] > 0.0)
    # Inflate small eigenvalues to 1% of the largest (VoxelGrid.cpp:308-318).
    min_ev = 0.01 * evals[:, 2]
    evc = jnp.maximum(evals, min_ev[:, None])
    inv_ev = 1.0 / jnp.maximum(evc, 1e-12)
    # icov = V diag(1/l) V^T, written as broadcast-multiply + sum on purpose:
    # a batched-3x3 dot_general here pads every matrix to an MXU tile and
    # blows HBM at millions of voxels (observed 24 GB at V = 4.2M).
    scaled = evecs * inv_ev[:, None, :]  # [V, 3, 3]
    icov = jnp.sum(scaled[:, :, None, :] * evecs[:, None, :, :], axis=-1)

    valid = enough & nondegen
    icov = jnp.where(valid[:, None, None], icov, 0.0)
    rows = jnp.concatenate(
        [
            mean,  # 0:3
            staticvalue[:, None],  # 3
            icov[:, 0, 0:3],  # 4:7 (xx, xy, xz)
            icov[:, 1, 1:3],  # 7:9 (yy, yz)
            icov[:, 2, 2:3],  # 9 (zz)
            valid[:, None].astype(jnp.float32),  # 10
            count[:, None],  # 11
            jnp.zeros((v, 4), jnp.float32),  # 12:16 pad to 64 B
        ],
        axis=-1,
    )
    return rows, icov, valid


def _pack_rows(origin, count, mean, icov, staticvalue, rows, valid, dims, config: NDTConfig) -> NDTMap:
    """Global compaction of conditioned rows into the NDTMap (cumsum over the
    FULL voxel axis — the only non-elementwise stage of map finalization).

    Packs OCCUPIED voxels (count >= min_points_per_voxel), matching the
    compact-first fast path (_condition_and_pack): a degenerate occupied
    voxel keeps its table row with a 0 valid flag, which both gather paths
    treat as absent."""
    v = dims[0] * dims[1] * dims[2]
    # compact the (sparse) occupied voxels: dense grid holds only int32 row
    # indices; stats live in a small table the stencil gather can cache
    cap = config.max_compact_voxels
    occupied = count >= float(config.min_points_per_voxel)
    pos = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    in_cap = occupied & (pos < cap)
    index = jnp.where(in_cap, pos, cap).astype(jnp.int32)
    scatter_to = jnp.where(in_cap, pos, cap)
    packed = jnp.zeros((cap + 1, 16), jnp.float32).at[scatter_to].set(
        jnp.where(in_cap[:, None], rows, 0.0), mode="drop"
    )
    packed = packed.at[cap].set(0.0)  # zero sentinel row (valid flag = 0)
    vid_all = jnp.arange(v, dtype=jnp.int32)
    keys = jnp.full((cap + 1,), -1, jnp.int32).at[scatter_to].set(
        jnp.where(in_cap, vid_all, -1), mode="drop"
    )
    keys = keys.at[cap].set(-1)
    # dense valid matches the fast path: overflow voxels are not addressable
    valid = valid & in_cap
    icov = jnp.where(valid[:, None, None], icov, 0.0)
    return NDTMap(
        origin=origin,
        count=count,
        mean=mean,
        icov=icov,
        staticvalue=staticvalue,
        valid=valid,
        index=index,
        packed=packed,
        keys=keys,
        dims=dims,
        resolution=config.resolution,
    )


def _condition_and_pack(origin, count, mean, cov, staticvalue, dims, config: NDTConfig) -> NDTMap:
    """Compact-FIRST finalization: gather the (sparse) occupied voxels into
    the fixed-capacity table and run the expensive conditioning — the 3x3
    eigendecomposition with its transcendentals — on [cap] rows instead of
    the millions-of-voxels dense grid (>99.9% empty at KITTI scale; measured
    ~6x faster map finalization on v5e). The dense O(V) work that remains is
    elementwise moments, one cumsum, and cheap scatters.

    Equivalent to conditioning densely and packing after: occupied voxels
    that turn out degenerate keep a table row with valid = 0, which both
    gather paths treat exactly like an absent voxel (zero contribution)."""
    v = dims[0] * dims[1] * dims[2]
    cap = config.max_compact_voxels
    occupied = count >= float(config.min_points_per_voxel)
    csum = jnp.cumsum(occupied.astype(jnp.int32))  # [V] inclusive
    pos = csum - 1
    in_cap = occupied & (pos < cap)
    index = jnp.where(in_cap, pos, cap).astype(jnp.int32)
    # compact candidate ids, ascending in vid: the j-th occupied voxel is
    # the first vid whose inclusive cumsum reaches j+1 (searchsorted beats
    # the [V]-update scatter ~2x on TPU; see finalize_ndt_sums)
    j = jnp.arange(cap + 1, dtype=jnp.int32)
    total = jnp.minimum(csum[-1], cap)
    keys = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
    keys = jnp.where(j < total, keys, -1)
    chas = keys >= 0  # [cap+1] row is a real occupied voxel
    cvid = jnp.maximum(keys, 0)

    # gather candidate stats and condition on the small table
    c_count = jnp.where(chas, count[cvid], 0.0)
    c_rows, c_icov, c_valid = _condition_rows(
        c_count, mean[cvid], cov[cvid], jnp.where(chas, staticvalue[cvid], 0.0), config
    )
    c_valid = c_valid & chas
    c_rows = jnp.where(chas[:, None], c_rows, 0.0)
    c_rows = c_rows.at[:, 10].set(c_valid.astype(jnp.float32))
    c_rows = c_rows.at[cap].set(0.0)  # zero sentinel row (valid flag = 0)
    c_icov = jnp.where(c_valid[:, None, None], c_icov, 0.0)

    # dense API views (fitness/tests): scatter the conditioned table back.
    # Sentinel rows go to the out-of-range index v (dropped) rather than
    # being clamped to 0, where they could clobber an occupied voxel 0.
    svid = jnp.where(chas, cvid, v)
    icov = jnp.zeros((v, 3, 3), jnp.float32).at[svid].set(c_icov, mode="drop")
    valid = jnp.zeros((v,), bool).at[svid].set(c_valid, mode="drop")
    return NDTMap(
        origin=origin,
        count=count,
        mean=mean,
        icov=icov,
        staticvalue=staticvalue,
        valid=valid,
        index=index,
        packed=c_rows,
        keys=keys,
        dims=dims,
        resolution=config.resolution,
    )


def _angle_jacobian_tensors(pose):
    """The eight j_ang and fifteen h_ang vectors of computeAngleDerivatives
    (NormalDistributionsTransform.cpp:525-645), packed as tensors so the
    per-point derivatives become einsums:

      Jrot[r, c] = JANG[c, r, :] . x       (rotation block of dx'/dp)
      Hrot[a, b, r] = HANG[a, b, r, :] . x (rotation-rotation point Hessian)
    """
    rx, ry, rz = pose[3], pose[4], pose[5]
    # Reference snaps tiny angles to exactly zero (cpp:528-548).
    def cs(a):
        tiny = jnp.abs(a) < 1e-4
        return jnp.where(tiny, 1.0, jnp.cos(a)), jnp.where(tiny, 0.0, jnp.sin(a))

    cx, sx = cs(rx)
    cy, sy = cs(ry)
    cz, sz = cs(rz)
    z3 = jnp.zeros(())

    j_a = jnp.stack([-sx * sz + cx * sy * cz, -sx * cz - cx * sy * sz, -cx * cy])
    j_b = jnp.stack([cx * sz + sx * sy * cz, cx * cz - sx * sy * sz, -sx * cy])
    j_c = jnp.stack([-sy * cz, sy * sz, cy])
    j_d = jnp.stack([sx * cy * cz, -sx * cy * sz, sx * sy])
    j_e = jnp.stack([-cx * cy * cz, cx * cy * sz, -cx * sy])
    j_f = jnp.stack([-cy * sz, -cy * cz, z3])
    j_g = jnp.stack([cx * cz - sx * sy * sz, -cx * sz - sx * sy * cz, z3])
    j_h = jnp.stack([sx * cz + cx * sy * sz, cx * sy * cz - sx * sz, z3])

    zero3 = jnp.zeros((3,))
    # JANG[c, r, :]: column c (roll/pitch/yaw), row r of the rotation Jacobian.
    jang = jnp.stack(
        [
            jnp.stack([zero3, j_a, j_b]),  # d/droll: rows (0, j_a, j_b)
            jnp.stack([j_c, j_d, j_e]),  # d/dpitch
            jnp.stack([j_f, j_g, j_h]),  # d/dyaw
        ]
    )

    h_a2 = jnp.stack([-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, sx * cy])
    h_a3 = jnp.stack([-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, -cx * cy])
    h_b2 = jnp.stack([cx * cy * cz, -cx * cy * sz, cx * sy])
    h_b3 = jnp.stack([sx * cy * cz, -sx * cy * sz, sx * sy])
    h_c2 = jnp.stack([-sx * cz - cx * sy * sz, sx * sz - cx * sy * cz, z3])
    h_c3 = jnp.stack([cx * cz - sx * sy * sz, -sx * sy * cz - cx * sz, z3])
    h_d1 = jnp.stack([-cy * cz, cy * sz, sy])
    h_d2 = jnp.stack([-sx * sy * cz, sx * sy * sz, sx * cy])
    h_d3 = jnp.stack([cx * sy * cz, -cx * sy * sz, -cx * cy])
    h_e1 = jnp.stack([sy * sz, sy * cz, z3])
    h_e2 = jnp.stack([-sx * cy * sz, -sx * cy * cz, z3])
    h_e3 = jnp.stack([cx * cy * sz, cx * cy * cz, z3])
    h_f1 = jnp.stack([-cy * cz, cy * sz, z3])
    h_f2 = jnp.stack([-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, z3])
    h_f3 = jnp.stack([-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, z3])

    # Vectors a..f of computePointDerivatives (cpp:463-470): component r of
    # the (angle_i, angle_j) second derivative is h[i][j][r] . x.
    va = jnp.stack([zero3, h_a2, h_a3])
    vb = jnp.stack([zero3, h_b2, h_b3])
    vc = jnp.stack([zero3, h_c2, h_c3])
    vd = jnp.stack([h_d1, h_d2, h_d3])
    ve = jnp.stack([h_e1, h_e2, h_e3])
    vf = jnp.stack([h_f1, h_f2, h_f3])
    hang = jnp.stack(
        [
            jnp.stack([va, vb, vc]),
            jnp.stack([vb, vd, ve]),
            jnp.stack([vc, ve, vf]),
        ]
    )  # [3, 3, 3(component r), 3(dot with x)]
    return jang, hang


def _stencil27():
    # plain numpy on purpose: a cached jnp array would leak tracers across
    # jit scopes (it is a fresh constant in every trace)
    import numpy as np

    ax = np.arange(-1, 2)
    ox, oy, oz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1).astype(np.int32)


def _stencil7():
    import numpy as np

    return np.asarray(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.int32,
    )


def _pose_to_matrix(pose):
    R = euler_xyz_to_matrix(pose[3], pose[4], pose[5])
    return make_pose(R, pose[:3])


def _matrix_to_pose(T):
    rx, ry, rz = matrix_to_euler_xyz(T[:3, :3])
    return jnp.concatenate([T[:3, 3], jnp.stack([rx, ry, rz])])


def _ndt_derivatives_fused(
    ndt_map: NDTMap, points, mask, pose, config: NDTConfig, weights, return_unresolved=False
):
    """Fused Pallas path: one-hot MXU stats selection over a per-tile key
    window + full derivative reduction in VMEM (ops/pallas/ndt_fused.py).
    Numerically equivalent to the XLA path (exact as long as the kernel's
    `unresolved` output is 0 — asserted in tests, checkable here with
    return_unresolved=True)."""
    from ...ops.pallas.ndt_fused import (
        KEY_SENTINEL,
        ndt_reduce_fused,
        pack_rows_x8,
        unpack_results,
        _NROWS,
    )
    from ...ops.pallas.ndt_reduce import pallas_supported

    d1, d2 = config.gauss_params()
    res = jnp.float32(ndt_map.resolution)
    dims = ndt_map.dims

    R = euler_xyz_to_matrix(pose[3], pose[4], pose[5])
    t = pose[:3]
    jang, hang = _angle_jacobian_tensors(pose)

    if weights is None:
        weights = jnp.ones(points.shape[:-1], jnp.float32)
    # non-finite unmasked points are gated out entirely (the XLA path's
    # isfinite guard); otherwise their NaN coords survive 0 * NaN in the
    # kernel's masked accumulation
    mask = mask & jnp.all(jnp.isfinite(points), axis=-1)
    tile = config.fused_tile
    n = points.shape[0]
    pad = (-n) % tile

    # Build everything as stacks of [N] lane-major vectors — measured 44% of
    # the whole (chained) evaluation used to go into [N, 31]-minor
    # intermediates, their transposes and the einsums' layout churn. Per-row
    # formulas are 3-term fmas with per-POSE scalar coefficients; the stack
    # lands directly in the kernel's [rows, N] orientation.
    px = jnp.where(mask, points[:, 0], 0.0)
    py = jnp.where(mask, points[:, 1], 0.0)
    pz = jnp.where(mask, points[:, 2], 0.0)
    xp0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
    xp1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
    xp2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
    pw = weights * mask.astype(jnp.float32)

    rows_list = [xp0, xp1, xp2, pw]
    # jrot[r, a] = sum_j jang[a, r, j] * p_j (rows _JR + 3r + a)
    for r in range(3):
        for a in range(3):
            rows_list.append(jang[a, r, 0] * px + jang[a, r, 1] * py + jang[a, r, 2] * pz)
    # hrot pairs (a, b) in ((0,0),(0,1),(0,2),(1,1),(1,2),(2,2)), component r
    for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        for r in range(3):
            rows_list.append(
                hang[a, b, r, 0] * px + hang[a, b, r, 1] * py + hang[a, b, r, 2] * pz
            )
    rows_t = jnp.stack(rows_list, axis=0)  # [31, N] lane-major
    assert rows_t.shape[0] == _NROWS

    inv_res = jnp.float32(1.0) / res
    cell_rows = []
    for k, (xpk, ok) in enumerate(((xp0, 0), (xp1, 1), (xp2, 2))):
        ck = jnp.floor((xpk - ndt_map.origin[ok]) * inv_res).astype(jnp.int32)
        # masked points go far out of bounds: no contribution, no unresolved
        cell_rows.append(jnp.where(mask, ck, -(2**20)))
    cell_t = jnp.stack(cell_rows, axis=0)  # [3, N]

    if pad:
        rows_t = jnp.pad(rows_t, ((0, 0), (0, pad)))
        cell_t = jnp.pad(cell_t, ((0, 0), (0, pad)), constant_values=-(2**20))
    cell_x8 = pack_rows_x8(cell_t, tile)  # [3*8, N'/8] sublane layout
    rows_x8 = pack_rows_x8(rows_t, tile)  # [31*8, N'/8] sublane layout

    c0 = ndt_map.keys.shape[0]
    cpad = (-c0) % 128
    keys = jnp.pad(ndt_map.keys, (0, cpad), constant_values=-1)
    keys = jnp.where(keys < 0, KEY_SENTINEL, keys)  # sorted ascending
    table_t = jnp.pad(ndt_map.packed, ((0, cpad), (0, 0))).T  # [16, C]
    c = keys.shape[0]
    window = min(config.fused_window, c)

    # per-GROUP key-window start (groups of tile/8 points — the kernel's
    # sublane groups), anchored at the smallest candidate vid any point in
    # the group can touch. Out-of-grid boundary points can still have
    # in-bounds stencil neighbours, so the anchor uses the CLAMPED cell
    # (each component moves <= 1 for a point with any in-bounds candidate,
    # and offsets are +-1), giving |candidate - clamped vid| <= 2 strides.
    span = 2 * (dims[1] * dims[2] + dims[2] + 1)
    dcl = jnp.asarray(dims, jnp.int32) - 1
    vid0 = (
        jnp.clip(cell_t[0], 0, dcl[0]) * dims[1] + jnp.clip(cell_t[1], 0, dcl[1])
    ) * dims[2] + jnp.clip(cell_t[2], 0, dcl[2])
    vid0 = jnp.where(jnp.pad(mask, (0, pad)), vid0, KEY_SENTINEL)
    vmin = jnp.min(vid0.reshape(-1, tile // 8), axis=1) - span  # [G * 8]
    lo_key = jnp.searchsorted(keys, vmin, side="left").astype(jnp.int32)
    lo = jnp.clip((lo_key // 128) * 128, 0, c - window)

    offsets = tuple(
        tuple(int(v) for v in row)
        for row in (_stencil27() if config.stencil == "radius27" else _stencil7())
    )
    sums = ndt_reduce_fused(
        lo,
        keys,
        table_t,
        cell_x8,
        rows_x8,
        dims=dims,
        offsets=offsets,
        d1=float(d1),
        d2=float(d2),
        res2=float(config.resolution) ** 2,
        gate_radius=(config.stencil == "radius27"),
        weight_derivatives=config.weight_derivatives,
        tile=tile,
        window=window,
        interpret=not pallas_supported(),
    )
    score, grad, hess, unresolved = unpack_results(sums)
    if return_unresolved:
        return score, grad, hess, unresolved
    return score, grad, hess


def ndt_derivatives(
    ndt_map: NDTMap,
    points,
    mask,
    pose,
    config: NDTConfig,
    compute_hessian: bool = True,
    weights=None,
    return_unresolved: bool = False,
):
    """Score, gradient and Hessian of the weighted NDT objective at `pose`.

    Vectorized equivalent of computeDerivatives
    (NormalDistributionsTransform.cpp:391-445). Chunked over points to bound
    the materialized [chunk, 27, ...] intermediates.

    Returns (score, gradient [6], hessian [6, 6]); hessian is zeros when
    compute_hessian=False. With return_unresolved=True, appends the fused
    kernel's exactness counter (0 on the XLA paths, which are always exact).
    """
    if config.resolve_gather() == "fused":
        return _ndt_derivatives_fused(
            ndt_map, points, mask, pose, config, weights, return_unresolved=return_unresolved
        )

    d1, d2 = config.gauss_params()
    d1 = jnp.float32(d1)
    d2 = jnp.float32(d2)
    dims = ndt_map.dims
    v = dims[0] * dims[1] * dims[2]
    res = jnp.float32(ndt_map.resolution)

    R = euler_xyz_to_matrix(pose[3], pose[4], pose[5])
    t = pose[:3]
    jang, hang = _angle_jacobian_tensors(pose)
    stencil = _stencil27() if config.stencil == "radius27" else _stencil7()

    if weights is None:
        weights = jnp.ones(points.shape[:-1], jnp.float32)

    chunk = config.point_chunk
    n = points.shape[0]
    pad = (-n) % chunk
    pts_c = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    mask_c = jnp.pad(mask, (0, pad)).reshape(-1, chunk)
    w_c = jnp.pad(weights, (0, pad)).reshape(-1, chunk)

    def one_chunk(args):
        x, m, pw = args  # [C,3], [C], [C]
        xp = x @ R.T + t  # transformed points

        cell = jnp.floor((xp - ndt_map.origin) / res).astype(jnp.int32)
        cand = cell[:, None, :] + stencil[None, :, :]  # [C, 27, 3]
        inb = jnp.all((cand >= 0) & (cand < jnp.asarray(dims, jnp.int32)), axis=-1)
        vid = jnp.where(inb, _flat_vid(cand, dims), 0)

        if config.gather == "onehot":
            from ...ops.pallas.ndt_reduce import gather_stats_onehot

            vid_masked = jnp.where(inb, vid, -2)
            pk = gather_stats_onehot(ndt_map.keys, ndt_map.packed, vid_masked)
        else:
            # two-level gather: 4 B/slot from the dense index grid, then 64 B
            # stats rows from the small compact table (see NDTMap docstring)
            ci = ndt_map.index[vid]  # [C, 27] int32
            pk = ndt_map.packed[ci]  # [C, 27, 16]
        mu = pk[..., 0:3]
        sv = pk[..., 3]
        ixx, ixy, ixz = pk[..., 4], pk[..., 5], pk[..., 6]
        iyy, iyz, izz = pk[..., 7], pk[..., 8], pk[..., 9]
        vvalid = (pk[..., 10] > 0.5) & inb

        e = xp[:, None, :] - mu
        # radiusSearch gate: centroid within `resolution` of the transformed
        # point (NormalDistributionsTransform.cpp:424). direct7 is ungated
        # like pclomp's DIRECT neighbourhoods.
        gate = vvalid & m[:, None]
        if config.stencil == "radius27":
            gate = gate & (jnp.sum(e * e, axis=-1) <= res * res)

        # q = C^-1 e from the symmetric-packed components (VPU elementwise;
        # avoids materializing [C, 27, 3, 3] for the score/gradient path)
        ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
        q = jnp.stack(
            [
                ixx * ex + ixy * ey + ixz * ez,
                ixy * ex + iyy * ey + iyz * ez,
                ixz * ex + iyz * ey + izz * ez,
            ],
            axis=-1,
        )
        md = jnp.sum(q * e, axis=-1)
        expt = jnp.exp(-0.5 * d2 * md)
        # updateDerivatives guards d2*exp(...) in [0, 1] (cpp:494-500).
        exd = d2 * expt
        gate = gate & (exd <= 1.0) & (exd >= 0.0) & jnp.isfinite(exd)
        gf = gate.astype(jnp.float32)

        score = jnp.sum(gf * sv * pw[:, None] * (-d1) * expt)

        dw = sv * pw[:, None] if config.weight_derivatives else pw[:, None] * jnp.ones_like(sv)
        f = gf * dw * d1 * d2 * expt  # [C, 27]

        # Point Jacobian J [C, 3(row), 6(col)]; rotation block
        # Jrot[c, r, a] = jang[a, r, :] . x[c]  (computePointDerivatives,
        # NormalDistributionsTransform.cpp:453-460)
        jrot = jnp.einsum("arj,cj->cra", jang, x)
        J = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), (x.shape[0], 3, 3)), jrot], axis=-1
        )  # [C, 3, 6]

        qJ = jnp.einsum("csk,ckp->csp", q, J)  # [C, 27, 6]
        grad = jnp.einsum("cs,csp->p", f, qJ)

        if compute_hessian:
            # term1 = -d2 (qJ)(qJ)^T; term3 = J^T C J
            h1 = -d2 * jnp.einsum("cs,csi,csj->ij", f, qJ, qJ)
            cinv = jnp.stack(
                [
                    jnp.stack([ixx, ixy, ixz], axis=-1),
                    jnp.stack([ixy, iyy, iyz], axis=-1),
                    jnp.stack([ixz, iyz, izz], axis=-1),
                ],
                axis=-2,
            )  # [C, 27, 3, 3]
            cJ = jnp.einsum("csik,ckp->csip", cinv, J)  # [C, 27, 3, 6]
            h3 = jnp.einsum("cs,cki,cskj->ij", f, J, cJ)
            # term2: q . Hrot over the rotation-rotation block
            hrot = jnp.einsum("abrk,ck->cabr", hang, x)  # [C, 3, 3, 3]
            h2r = jnp.einsum("cs,csr,cabr->ab", f, q, hrot)  # [3, 3]
            hess = h1 + h3
            hess = hess.at[3:, 3:].add(h2r)
        else:
            hess = jnp.zeros((6, 6))
        return score, grad, hess

    scores, grads, hesses = jax.lax.map(one_chunk, (pts_c, mask_c, w_c))
    if return_unresolved:
        return jnp.sum(scores), jnp.sum(grads, axis=0), jnp.sum(hesses, axis=0), jnp.float32(0.0)
    return jnp.sum(scores), jnp.sum(grads, axis=0), jnp.sum(hesses, axis=0)


def _solve_newton(hessian, gradient):
    """delta = -H^-1 g via an UNROLLED 6x6 LDL^T solve.

    The reference solves with JacobiSVD (cpp:353-355); for a symmetric
    NONSINGULAR 6x6 the signed-eigenvalue inverse, the SVD solve and LDL^T
    all agree (signs recombine), and LDL^T handles the indefinite-Hessian
    iterations NDT produces. jnp.linalg.eigh on a 6x6 lowers to an
    iterative TPU kernel costing ~1 ms PER NEWTON ITERATION (~40% of a
    whole tracking frame at the production operating point); this unrolled
    form is a ~100-op scalar chain. Near-singular pivots yield huge or
    non-finite deltas, which newton_body's `degenerate` guard converts to
    convergence — the same outcome the old path reached via zeroed
    eigenvalues (e.g. the all-zero Hessian of an empty map)."""
    H = hessian
    n = 6
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    for j in range(n):
        s = H[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k] * D[k]
        D[j] = s
        inv_d = 1.0 / s
        for i in range(j + 1, n):
            t = H[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k] * D[k]
            L[i][j] = t * inv_d
    # forward: y = L^-1 (-g)
    y = [None] * n
    for i in range(n):
        t = -gradient[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t
    # diagonal + backward: delta = L^-T (y / D)
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i] / D[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t
    return jnp.stack(x)


def _psi(a, phi_a, phi_0, d_phi_0, mu):
    return phi_a - phi_0 - mu * d_phi_0 * a


def _d_psi(d_phi_a, d_phi_0, mu):
    return d_phi_a - mu * d_phi_0


def _trial_value_selection(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """More-Thuente trial value selection, 4 cases
    (trialValueSelectionMT, NormalDistributionsTransform.cpp:762-838),
    expressed branch-free with jnp.where."""
    eps = 1e-12
    dal = a_t - a_l
    safe_dal = jnp.where(jnp.abs(dal) < eps, eps, dal)

    z1 = 3.0 * (f_t - f_l) / safe_dal - g_t - g_l
    w1 = jnp.sqrt(jnp.maximum(z1 * z1 - g_t * g_l, 0.0))
    a_c = a_l + dal * (w1 - g_l - z1) / jnp.where(
        jnp.abs(g_t - g_l + 2.0 * w1) < eps, eps, g_t - g_l + 2.0 * w1
    )

    denom_q = g_l - (f_l - f_t) / safe_dal
    a_q = a_l - 0.5 * dal * g_l / jnp.where(jnp.abs(denom_q) < eps, eps, denom_q)

    denom_s = g_l - g_t
    a_s = a_l - dal / jnp.where(jnp.abs(denom_s) < eps, eps, denom_s) * g_l

    # Case 1: f_t > f_l
    case1 = jnp.where(jnp.abs(a_c - a_l) < jnp.abs(a_q - a_l), a_c, 0.5 * (a_q + a_c))
    # Case 2: g_t * g_l < 0
    case2 = jnp.where(jnp.abs(a_c - a_t) >= jnp.abs(a_s - a_t), a_c, a_s)
    # Case 3: |g_t| <= |g_l|
    a_t_next = jnp.where(jnp.abs(a_c - a_t) < jnp.abs(a_s - a_t), a_c, a_s)
    case3 = jnp.where(
        a_t > a_l,
        jnp.minimum(a_t + 0.66 * (a_u - a_t), a_t_next),
        jnp.maximum(a_t + 0.66 * (a_u - a_t), a_t_next),
    )
    # Case 4: cubic on the u side
    dau = a_t - a_u
    safe_dau = jnp.where(jnp.abs(dau) < eps, eps, dau)
    z4 = 3.0 * (f_t - f_u) / safe_dau - g_t - g_u
    w4 = jnp.sqrt(jnp.maximum(z4 * z4 - g_t * g_u, 0.0))
    case4 = a_u + dau * (w4 - g_u - z4) / jnp.where(
        jnp.abs(g_t - g_u + 2.0 * w4) < eps, eps, g_t - g_u + 2.0 * w4
    )

    return jnp.where(
        f_t > f_l,
        case1,
        jnp.where(g_t * g_l < 0.0, case2, jnp.where(jnp.abs(g_t) <= jnp.abs(g_l), case3, case4)),
    )


def _update_interval(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """updateIntervalMT (cpp:841-874): returns new bounds + converged flag."""
    c1 = f_t > f_l
    c2 = g_t * (a_l - a_t) > 0.0
    c3 = g_t * (a_l - a_t) < 0.0

    new_a_u = jnp.where(c1, a_t, jnp.where(c2, a_u, jnp.where(c3, a_l, a_u)))
    new_f_u = jnp.where(c1, f_t, jnp.where(c2, f_u, jnp.where(c3, f_l, f_u)))
    new_g_u = jnp.where(c1, g_t, jnp.where(c2, g_u, jnp.where(c3, g_l, g_u)))
    new_a_l = jnp.where(c1, a_l, a_t)
    new_f_l = jnp.where(c1, f_l, f_t)
    new_g_l = jnp.where(c1, g_l, g_t)
    converged = ~(c1 | c2 | c3)
    return new_a_l, new_f_l, new_g_l, new_a_u, new_f_u, new_g_u, converged


def lm_align(derivs, init_pose, config: NDTConfig, n_valid_points):
    """Levenberg-Marquardt on L(p) = -score: full damped-Newton trial steps
    with accept/reject, one derivative evaluation per iteration.

    Alternative step policy to the reference's 0.1 m clamp
    (NormalDistributionsTransform.cpp:367,682-756). Round-3 TPU measurement:
    on aliased corridor scenes LM's accept test stalls (29 evals, worse pose
    error than newton) — see NDTConfig.solver for the production guidance.
    """
    p0 = _matrix_to_pose(jnp.asarray(init_pose, jnp.float32))
    score0, grad0, hess0, unres0 = derivs(p0, True)

    lam0 = jnp.float32(1e-4)
    lam_max = jnp.float32(1e6)

    def solve_damped(hess_l, grad_l, lam):
        d = jnp.abs(jnp.diag(hess_l))
        damp = jnp.diag(jnp.maximum(d, 1e-6) * lam)
        A = hess_l + damp
        delta = jnp.linalg.solve(A, -grad_l)
        bad = ~jnp.all(jnp.isfinite(delta))
        return jnp.where(bad, 0.0, delta), bad

    def cond(st):
        _, _, _, _, lam, it, converged, _ = st
        return (~converged) & (it < config.max_iter) & (lam < lam_max)

    def body(st):
        p, score, grad, hess, lam, it, _, unres = st
        # minimize L = -score
        delta, bad = solve_damped(-hess, -grad, lam)
        p_t = p + delta
        s_t, g_t, h_t, u_t = derivs(p_t, True)
        accept = jnp.isfinite(s_t) & (s_t > score) & ~bad
        p_n = jnp.where(accept, p_t, p)
        s_n = jnp.where(accept, s_t, score)
        g_n = jnp.where(accept, g_t, grad)
        h_n = jnp.where(accept, h_t, hess)
        lam_n = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7), lam * 9.0)
        step = jnp.linalg.norm(delta)
        # converged only when the undamped model agrees: small step at small
        # lambda (a high-lambda tiny step is the damping, not the optimum)
        converged = accept & (step < config.trans_eps) & (lam <= 1e-2)
        return (p_n, s_n, g_n, h_n, lam_n, it + 1, converged, jnp.maximum(unres, u_t))

    init = (p0, score0, grad0, hess0, lam0, jnp.int32(0), jnp.bool_(False), unres0)
    p, score, grad, hess, lam, iters, converged, unres = jax.lax.while_loop(cond, body, init)

    n_valid = jnp.maximum(jnp.asarray(n_valid_points, jnp.float32), 1.0)
    return NDTResult(
        pose=_pose_to_matrix(p),
        trans_probability=score / n_valid,
        score=score,
        iterations=iters,
        converged=converged,
        gradient=grad,
        hessian=hess,
        unresolved=unres,
    )


def newton_align(derivs, init_pose, config: NDTConfig, n_valid_points):
    """Newton iteration over p = (t, roll, pitch, yaw) with the (optionally
    zero-iteration) More-Thuente step-length rule — functional port of
    computeTransformation (NormalDistributionsTransform.cpp:310-389).

    `derivs(pose6, need_hessian) -> (score, grad, hess, unresolved)`
    abstracts where the reduction runs: local arrays (ndt_align) or a device
    mesh with psum (parallel/sharded_ndt.py). With config.solver == 'lm',
    dispatches to lm_align (same interface, different step-length policy).
    """
    if config.solver == "lm":
        return lm_align(derivs, init_pose, config, n_valid_points)
    mu = 1.0e-4
    nu = 0.9
    step_min = config.trans_eps / 2.0
    step_max = config.step_size

    p0 = _matrix_to_pose(jnp.asarray(init_pose, jnp.float32))
    score0, grad0, hess0, unres0 = derivs(p0, True)

    def line_search(p, direction, step_init, score, grad):
        """Returns (alpha, new p, score/grad/hess at accepted point)."""
        phi_0 = -score
        d_phi_0 = -jnp.dot(grad, direction)
        # Reference flips the direction if it is not a descent direction.
        flip = d_phi_0 > 0.0
        direction = jnp.where(flip, -direction, direction)
        d_phi_0 = jnp.where(flip, -d_phi_0, d_phi_0)

        a_t0 = jnp.clip(step_init, step_min, step_max)

        if config.max_step_iterations > 0:

            def eval_phi(a):
                s, g, _, _ = derivs(p + a * direction, False)
                return -s, -jnp.dot(g, direction)

            phi_t, d_phi_t = eval_phi(a_t0)
            psi_t = _psi(a_t0, phi_t, phi_0, d_phi_0, mu)
            d_psi_t = _d_psi(d_phi_t, d_phi_0, mu)

            f_l0 = _psi(0.0, phi_0, phi_0, d_phi_0, mu)
            g_l0 = _d_psi(d_phi_0, d_phi_0, mu)
            state = (
                jnp.float32(0.0), f_l0, g_l0,  # a_l, f_l, g_l
                jnp.float32(0.0), f_l0, g_l0,  # a_u, f_u, g_u
                a_t0, phi_t, d_phi_t, psi_t, d_psi_t,
                jnp.bool_(True),  # open interval
                jnp.bool_(False),  # interval converged
                jnp.int32(0),
            )

            def cond(st):
                (_, _, _, _, _, _, _, _, d_phi_t, psi_t, _, _, conv, it) = st
                done = (psi_t <= 0.0) & (d_phi_t <= -nu * d_phi_0)
                return (~conv) & (it < config.max_step_iterations) & (~done)

            def body(st):
                (a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, d_phi_t, psi_t, d_psi_t, open_i, conv, it) = st
                f_t = jnp.where(open_i, psi_t, phi_t)
                g_t = jnp.where(open_i, d_psi_t, d_phi_t)
                a_new = _trial_value_selection(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t)
                a_new = jnp.clip(a_new, step_min, step_max)
                phi_n, d_phi_n = eval_phi(a_new)
                psi_n = _psi(a_new, phi_n, phi_0, d_phi_0, mu)
                d_psi_n = _d_psi(d_phi_n, d_phi_0, mu)

                close_now = open_i & (psi_n <= 0.0) & (d_psi_n >= 0.0)
                adj_l = phi_0 - mu * d_phi_0 * a_l
                adj_u = phi_0 - mu * d_phi_0 * a_u
                f_l = jnp.where(close_now, f_l + adj_l, f_l)
                g_l = jnp.where(close_now, g_l + mu * d_phi_0, g_l)
                f_u = jnp.where(close_now, f_u + adj_u, f_u)
                g_u = jnp.where(close_now, g_u + mu * d_phi_0, g_u)
                open_n = open_i & ~close_now

                f_sel = jnp.where(open_n, psi_n, phi_n)
                g_sel = jnp.where(open_n, d_psi_n, d_phi_n)
                a_l2, f_l2, g_l2, a_u2, f_u2, g_u2, conv2 = _update_interval(
                    a_l, f_l, g_l, a_u, f_u, g_u, a_new, f_sel, g_sel
                )
                return (a_l2, f_l2, g_l2, a_u2, f_u2, g_u2, a_new, phi_n, d_phi_n, psi_n, d_psi_n, open_n, conv2, it + 1)

            state = jax.lax.while_loop(cond, body, state)
            a_t = state[6]
        else:
            a_t = a_t0

        p_new = p + a_t * direction
        s, g, h, u = derivs(p_new, True)
        return a_t, p_new, s, g, h, u

    def newton_cond(st):
        _, _, _, _, it, converged, _ = st
        return (~converged) & (it <= config.max_iter)

    def newton_body(st):
        p, score, grad, hess, it, _, unres = st
        delta = _solve_newton(hess, grad)
        dnorm = jnp.linalg.norm(delta)
        degenerate = (dnorm == 0.0) | ~jnp.isfinite(dnorm)
        direction = delta / jnp.where(degenerate, 1.0, dnorm)
        alpha, p_new, s, g, h, u = line_search(p, direction, dnorm, score, grad)
        p_new = jnp.where(degenerate, p, p_new)
        s = jnp.where(degenerate, score, s)
        converged = degenerate | ((it >= 1) & (jnp.abs(alpha) < config.trans_eps))
        if config.score_rel_tol > 0:
            plateau = (it >= 3) & (
                jnp.abs(s - score) < config.score_rel_tol * jnp.maximum(jnp.abs(score), 1e-6)
            )
            converged = converged | plateau
        return (
            p_new,
            s,
            jnp.where(degenerate, grad, g),
            jnp.where(degenerate, hess, h),
            it + 1,
            converged,
            jnp.maximum(unres, u),
        )

    init = (p0, score0, grad0, hess0, jnp.int32(0), jnp.bool_(False), unres0)
    p, score, grad, hess, iters, converged, unres = jax.lax.while_loop(newton_cond, newton_body, init)

    n_valid = jnp.maximum(jnp.asarray(n_valid_points, jnp.float32), 1.0)
    return NDTResult(
        pose=_pose_to_matrix(p),
        trans_probability=score / n_valid,
        score=score,
        iterations=iters,
        converged=converged,
        gradient=grad,
        hessian=hess,
        unresolved=unres,
    )


@partial(jax.jit, static_argnames=("config",))
def ndt_align(
    ndt_map: NDTMap,
    source: PointCloud,
    init_pose,
    config: NDTConfig = NDTConfig(),
) -> NDTResult:
    """Align a source cloud to the NDT map starting from init_pose [4,4]."""
    pts = source.points
    mask = source.mask
    w = source.get_weights()

    if config.resolve_gather() == "fused":
        pts, mask, w = sort_points_by_vid(ndt_map, pts, mask, w, init_pose)

    def derivs(pose, need_hessian):
        return ndt_derivatives(
            ndt_map, pts, mask, pose, config, need_hessian, weights=w, return_unresolved=True
        )

    return newton_align(derivs, init_pose, config, source.num_valid())


def sort_points_by_vid(ndt_map: NDTMap, pts, mask, w, init_pose):
    """Sort points by initial-pose voxel id ONCE per alignment: the fused
    kernel's per-tile key window needs spatially coherent tiles, and the
    pose moves <= step_size per iteration so the order stays coherent
    across the whole Newton loop."""
    T0 = jnp.asarray(init_pose, jnp.float32)
    xp0 = pts @ T0[:3, :3].T + T0[:3, 3]
    cell0 = jnp.floor((xp0 - ndt_map.origin) / ndt_map.resolution).astype(jnp.int32)
    cell0 = jnp.clip(cell0, 0, jnp.asarray(ndt_map.dims, jnp.int32) - 1)
    vid0 = _flat_vid(cell0, ndt_map.dims)
    vid0 = jnp.where(mask, vid0, jnp.int32(2**30))
    # multi-operand sort: carrying the channels through the sort beats
    # argsort + per-channel reorder gathers ~5x on TPU (see voxel_downsample)
    _, sx, sy, sz, smi, sw = jax.lax.sort(
        (vid0, pts[:, 0], pts[:, 1], pts[:, 2], mask.astype(jnp.int32), w),
        num_keys=1,
    )
    return jnp.stack([sx, sy, sz], axis=-1), smi.astype(bool), sw


@partial(jax.jit, static_argnames=("config", "max_range"))
def ndt_fitness_score(ndt_map: NDTMap, source: PointCloud, pose, config: NDTConfig, max_range: float = 4.0):
    """Mean distance from transformed source points to the nearest occupied
    voxel centroid (getFitnessScore, NormalDistributionsTransform.cpp:940-965;
    nearest-voxel search VoxelGrid.cpp:483-543). The stencil covers
    ceil(max_range / resolution) cells per axis: a centroid within max_range
    of a point lies in a cell at most that many cells away, so every point
    whose true nearest centroid is within max_range is counted (the round-1
    cap at 2 cells silently dropped points with NN in (2*res, max_range]).
    The radius is bounded at 8 cells (17^3 offsets) to keep the gather
    intermediates from growing cubically at fine resolutions; beyond that
    the effective max_range saturates at 8 * resolution (points with no
    centroid inside it are excluded, exactly like points beyond max_range)."""
    import numpy as np

    dims = ndt_map.dims
    res = jnp.float32(ndt_map.resolution)
    r_cells = max(1, min(8, int(math.ceil(max_range / config.resolution))))
    ax = np.arange(-r_cells, r_cells + 1)
    ox, oy, oz = np.meshgrid(ax, ax, ax, indexing="ij")
    stencil = jnp.asarray(np.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1), jnp.int32)

    T = jnp.asarray(pose, jnp.float32)
    xp = source.points @ T[:3, :3].T + T[:3, 3]
    # bound the [chunk, |stencil|] gather intermediates for wide stencils:
    # target ~4M elements per chunk regardless of stencil volume
    chunk = int(max(512, min(4096, (1 << 22) // int(stencil.shape[0]))))
    n = xp.shape[0]
    pad = (-n) % chunk
    xpc = jnp.pad(xp, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    mc = jnp.pad(source.mask, (0, pad)).reshape(-1, chunk)

    def one(args):
        x, m = args
        cell = jnp.floor((x - ndt_map.origin) / res).astype(jnp.int32)
        cand = cell[:, None, :] + stencil[None, :, :]
        inb = jnp.all((cand >= 0) & (cand < jnp.asarray(dims, jnp.int32)), axis=-1)
        vid = jnp.where(inb, _flat_vid(cand, dims), 0)
        occupied = (ndt_map.count[vid] > 0) & inb
        mu = ndt_map.mean[vid]
        d = jnp.sqrt(jnp.sum((x[:, None, :] - mu) ** 2, axis=-1))
        d = jnp.where(occupied, d, jnp.inf)
        dmin = jnp.min(d, axis=-1)
        use = m & (dmin < max_range)
        return jnp.sum(jnp.where(use, dmin, 0.0)), jnp.sum(use.astype(jnp.float32))

    sums, counts = jax.lax.map(one, (xpc, mc))
    total = jnp.sum(counts)
    return jnp.where(total > 0, jnp.sum(sums) / jnp.maximum(total, 1.0), jnp.inf)
