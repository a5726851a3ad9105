"""Fused A-LOAM pipeline step: all three stages in ONE device program.

The reference runs scanRegistration, laserOdometry, and laserMapping as
three ROS processes exchanging clouds over topics
(A-LOAM-devel/launch/aloam_velodyne_HDL_64.launch). The staged wrappers here
(AloamOdometry / AloamMapping) mirror that structure but cost three device
dispatches + host round-trips per sweep — ~30 ms each on remote transports.
This module compiles the whole sweep (feature extraction -> frame-to-frame
odometry -> scan-to-map refinement -> map fold) into a single jitted program
over an explicit state pytree, so one dispatch and one device_get serve a
frame. Numerically identical to the staged path (asserted in tests).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.pointcloud import PointCloud
from .feature_extraction import FeatureExtractionConfig, ScanFeatures, extract_features
from .mapping import AloamMappingConfig, downsample_stacks, map_update, mapping_step
from .odometry import AloamOdometryConfig, odometry_step


@flax.struct.dataclass
class AloamState:
    """Cross-sweep state of the fused pipeline (device-resident pytree)."""

    prev_less_sharp: PointCloud
    prev_less_sharp_ring: jax.Array
    prev_less_flat: PointCloud
    prev_less_flat_ring: jax.Array
    T_rel: jax.Array  # [4, 4] constant-velocity warm start
    T_world: jax.Array  # [4, 4] odometry world pose (q_w_curr/t_w_curr)
    T_map_odom: jax.Array  # [4, 4] wmap_T_wodom (transformAssociateToMap)
    corner_map: PointCloud
    surf_map: PointCloud
    has_prev: jax.Array  # [] bool — odometry valid from the 2nd sweep
    map_init: jax.Array  # [] bool — mapping valid once the map has content


def init_aloam_state(
    fe_cfg: FeatureExtractionConfig, map_cfg: AloamMappingConfig
) -> AloamState:
    eye = jnp.eye(4, dtype=jnp.float32)

    def empty(cap):
        return PointCloud(
            points=jnp.zeros((cap, 3), jnp.float32), mask=jnp.zeros(cap, bool)
        )

    return AloamState(
        prev_less_sharp=empty(fe_cfg.max_less_sharp),
        prev_less_sharp_ring=jnp.zeros(fe_cfg.max_less_sharp, jnp.int32),
        prev_less_flat=empty(fe_cfg.max_less_flat),
        prev_less_flat_ring=jnp.zeros(fe_cfg.max_less_flat, jnp.int32),
        T_rel=eye,
        T_world=eye,
        T_map_odom=eye,
        corner_map=empty(map_cfg.corner_map_capacity),
        surf_map=empty(map_cfg.surf_map_capacity),
        has_prev=jnp.asarray(False),
        map_init=jnp.asarray(False),
    )


@partial(jax.jit, static_argnames=("fe_cfg", "odo_cfg", "map_cfg"))
def aloam_step(
    state: AloamState,
    points,  # [capacity, 3] padded sweep
    mask,  # [capacity]
    fe_cfg: FeatureExtractionConfig,
    odo_cfg: AloamOdometryConfig,
    map_cfg: AloamMappingConfig,
) -> Tuple[AloamState, jax.Array, jax.Array]:
    """One sweep end-to-end. Returns (new state, T_map [4,4], T_odom [4,4])."""
    f: ScanFeatures = extract_features(points, mask, fe_cfg)

    # frame-to-frame odometry vs the previous sweep's less-sharp/less-flat
    # features (laserOdometry.cpp:278-506). The first sweep has no previous
    # features — the step still executes (masked empty clouds contribute no
    # correspondences) and the identity result is selected.
    T_rel = odometry_step(
        state.prev_less_sharp,
        state.prev_less_sharp_ring,
        state.prev_less_flat,
        state.prev_less_flat_ring,
        f.sharp,
        f.flat,
        state.T_rel,
        odo_cfg,
    )
    eye = jnp.eye(4, dtype=jnp.float32)
    T_rel = jnp.where(state.has_prev, T_rel, eye)
    T_world = state.T_world @ T_rel

    # scan-to-map refinement (laserMapping.cpp:571-727) on the res-matched
    # feature stacks (downSizeFilterCorner/Surf, :556-566)
    guess = state.T_map_odom @ T_world
    stack_corner, stack_surf = downsample_stacks(f.less_sharp, f.less_flat, map_cfg)
    T_map = mapping_step(state.corner_map, state.surf_map, stack_corner, stack_surf, guess, map_cfg)
    T_map = jnp.where(state.map_init, T_map, guess)
    corner_map, surf_map = map_update(
        state.corner_map, state.surf_map, stack_corner, stack_surf, T_map, map_cfg
    )
    # transformUpdate (laserMapping.cpp:148-152): wmap_T_wodom correction
    T_map_odom = T_map @ jnp.linalg.inv(T_world)

    new_state = AloamState(
        prev_less_sharp=f.less_sharp,
        prev_less_sharp_ring=f.less_sharp_ring,
        prev_less_flat=f.less_flat,
        prev_less_flat_ring=f.less_flat_ring,
        T_rel=T_rel,
        T_world=T_world,
        T_map_odom=T_map_odom,
        corner_map=corner_map,
        surf_map=surf_map,
        has_prev=jnp.asarray(True),
        map_init=jnp.asarray(True),
    )
    return new_state, T_map, T_world


@partial(jax.jit, static_argnames=("fe_cfg", "odo_cfg", "map_cfg"))
def aloam_drive(
    state: AloamState,
    points_seq,  # [T, capacity, 3]
    mask_seq,  # [T, capacity]
    fe_cfg: FeatureExtractionConfig,
    odo_cfg: AloamOdometryConfig,
    map_cfg: AloamMappingConfig,
) -> Tuple[AloamState, jax.Array]:
    """Chain a whole sweep sequence through one program (lax.scan): the
    frame-to-frame dependency is preserved — this measures honest sequential
    throughput — but host round-trips between sweeps are eliminated.
    Returns (final state, T_map poses [T, 4, 4])."""

    def one(st, inp):
        pts, msk = inp
        st, T_map, _ = aloam_step(st, pts, msk, fe_cfg, odo_cfg, map_cfg)
        return st, T_map

    return jax.lax.scan(one, state, (points_seq, mask_seq))


class AloamPipeline:
    """Host wrapper over the fused step — the one-process form of the
    three-node A-LOAM launch graph. One dispatch + one device_get per sweep."""

    def __init__(
        self,
        fe_cfg: FeatureExtractionConfig = FeatureExtractionConfig(),
        odo_cfg: AloamOdometryConfig = AloamOdometryConfig(),
        map_cfg: AloamMappingConfig = AloamMappingConfig(),
    ):
        self.fe_cfg = fe_cfg
        self.odo_cfg = odo_cfg
        self.map_cfg = map_cfg
        self.state = init_aloam_state(fe_cfg, map_cfg)
        self.T0 = np.eye(4, dtype=np.float32)

    def set_init_pose(self, pose) -> None:
        self.T0 = np.asarray(pose, np.float32)

    def preload(self, points, mask=None):
        """Pad + upload one sweep (callable from a prefetch thread — see
        FrontEnd.preload for the overlap rationale)."""
        pts = np.zeros((self.fe_cfg.capacity, 3), np.float32)
        msk = np.zeros(self.fe_cfg.capacity, bool)
        n = min(len(points), self.fe_cfg.capacity)
        pts[:n] = np.asarray(points, np.float32)[:n]
        if mask is None:
            msk[:n] = True
        else:
            msk[:n] = np.asarray(mask, bool)[:n]
        return jnp.asarray(pts), jnp.asarray(msk)

    def update(self, points, mask=None, bboxes=None, preloaded=None):
        """FrontEnd-compatible API: raw sweep in, world pose out."""
        pts, msk = preloaded if preloaded is not None else self.preload(points, mask)
        self.state, T_map, _ = aloam_step(
            self.state, pts, msk, self.fe_cfg, self.odo_cfg, self.map_cfg
        )
        return (self.T0 @ np.asarray(T_map)).astype(np.float32), False

    def update_batch(self, frames):
        """Feed a list of (points, mask) sweeps through one scan-chained
        program (aloam_drive); returns world poses [T, 4, 4]. Sequential
        semantics are identical to repeated update() calls."""
        pts = jnp.stack([self.preload(p, m)[0] for p, m in frames])
        msk = jnp.stack([self.preload(p, m)[1] for p, m in frames])
        self.state, T_maps = aloam_drive(
            self.state, pts, msk, self.fe_cfg, self.odo_cfg, self.map_cfg
        )
        return np.einsum("ij,tjk->tik", self.T0, np.asarray(T_maps)).astype(np.float32)
