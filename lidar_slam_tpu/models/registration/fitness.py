"""Point-NN fitness score — the PCL getFitnessScore the reference's loop
closing actually gates on.

The reference's loop verification registers with the PCL NDT wrapper
(loop_closing.cpp:78-80 -> NDTRegistration) whose GetFitnessScore
(ndt_registration.cpp:63-66) is pcl::Registration::getFitnessScore():
the mean SQUARED distance from each transformed source point to its
nearest TARGET POINT (kd-tree NN over the 0.3 m-filtered submap cloud).
That is a different quantity from the manual-NDT centroid fitness
(NormalDistributionsTransform.cpp:940-965, ops in ndt.ndt_fitness_score):
voxel centroids on planar structure sit ~0.3 m from member points at
res 1.0, so the centroid metric has a ~0.3 m floor at a PERFECT pose and
can never pass the reference's 0.2 loop gate — point-NN distances have no
such floor.

TPU-native design (round 5): EXACT brute-force NN on the MXU. The squared
distance matrix factors as |q|^2 + |t|^2 - 2 q.t; the cross term is a
[Nq, 3] @ [3, chunk] matmul per target chunk with a running elementwise
min — ~6 GFLOP + ~4 GB of chunk traffic at 16k x 65k, ~6 ms on a v5e.
This replaced a bucket-grid gather path (27-cell stencil x bucket_k
candidate rows) that cost 155 ms at the same shapes — TPU gathers run
near one element per cycle while matmul+min runs at full tile throughput —
and removes that path's candidate-truncation deviation entirely: every
target point competes, exactly PCL's kd-tree semantics.

Remaining deviation from PCL (documented): PCL's default max_range is
unbounded; here squared distances clamp at max_radius^2 (source points in
regions the submap does not cover contribute max_radius^2 instead of an
arbitrarily huge value). At a true loop the submap (±2 keyframes of
full-range scans) covers the query scan's field of view, so almost nothing
clamps; at a false loop the clamp only makes rejection more decisive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.pointcloud import PointCloud


def point_nn_fitness_score(
    target: PointCloud,
    source: PointCloud,
    pose,
    max_radius: float = 2.0,
    chunk: int = 2048,
) -> jax.Array:
    """Mean squared NN distance from posed source points to target points.

    Mirrors pcl::Registration::getFitnessScore() as consumed by the
    reference's loop gate (loop_closing.cpp:253, fitness_score_limit 0.2).
    Exact over ALL target points (chunked MXU distance matrix — see module
    docstring). Returns a scalar f32 (device); jit-compatible.
    """
    T = jnp.asarray(pose, jnp.float32)
    xp = source.points @ T[:3, :3].T + T[:3, 3]  # [Nq, 3]
    xp = jnp.where(source.mask[:, None], xp, 0.0)
    qq = jnp.sum(xp * xp, axis=-1)  # [Nq]

    nt = target.points.shape[0]
    pad = (-nt) % chunk
    tp = jnp.pad(jnp.where(target.mask[:, None], target.points, 0.0), ((0, pad), (0, 0)))
    tv = jnp.pad(target.mask, (0, pad))
    tt = jnp.sum(tp * tp, axis=-1)
    # invalid targets never win the min
    tt = jnp.where(tv, tt, jnp.inf)
    tp_c = tp.reshape(-1, chunk, 3)
    tt_c = tt.reshape(-1, chunk)

    max_r2 = jnp.float32(max_radius * max_radius)

    def body(running_min, inp):
        ct, ctt = inp
        cross = jnp.dot(xp, ct.T, preferred_element_type=jnp.float32)  # [Nq, chunk]
        d2c = qq[:, None] - 2.0 * cross + ctt[None, :]
        return jnp.minimum(running_min, jnp.min(d2c, axis=1)), None

    d2, _ = jax.lax.scan(body, jnp.full(qq.shape, jnp.inf, jnp.float32), (tp_c, tt_c))
    # guard against tiny negative float residue at d ~ 0, then clamp
    d2 = jnp.minimum(jnp.maximum(d2, 0.0), max_r2)
    m = source.mask.astype(jnp.float32)
    return jnp.sum(d2 * m) / jnp.maximum(jnp.sum(m), 1.0)
