"""Closed-form batched 3x3 linear solves.

XLA lowers ``jnp.linalg.solve`` on [N, 3, 3] batches to a general LU kernel
that is ~20x slower on TPU than the arithmetic actually needs; tiny fixed-size
systems (plane fits A n = -1, laserMapping.cpp:643-688) want the adjugate
(Cramer) form, which is pure VPU elementwise work and fuses with its
neighbours.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve3(A, b, eps: float = 1e-12):
    """Solve A x = b for batched 3x3 A ([..., 3, 3]) and b ([..., 3]) via the
    adjugate. Singular systems (|det| <= eps) return 0 — callers gate on
    their own validity checks."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02

    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = c00 * b0 + c10 * b1 + c20 * b2
    x1 = c01 * b0 + c11 * b1 + c21 * b2
    x2 = c02 * b0 + c12 * b1 + c22 * b2
    x = jnp.stack([x0, x1, x2], axis=-1)
    safe = jnp.abs(det) > eps
    return jnp.where(safe[..., None], x / jnp.where(safe, det, 1.0)[..., None], 0.0)
