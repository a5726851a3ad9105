"""Closed-form symmetric 3x3 eigendecomposition, batched and jit-safe.

TPU-native replacement for the reference's SymmetricEigensolver3x3
(ndt_registration_manual/SymmetricEigenSolver.h:11-276), which conditions
per-voxel NDT covariances. Unlike the reference (scalar, per voxel, CPU),
this is fully vectorized over an arbitrary leading batch of matrices so a
whole voxel grid's covariances are conditioned in one fused XLA computation.

Algorithm: the standard trigonometric (Cardano) closed form for the
eigenvalues of a symmetric 3x3, followed by cross-product eigenvector
extraction with pivoting — the same approach as the reference header
(itself derived from the classic Eberly writeup).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _eigenvalues(A):
    """Eigenvalues of symmetric [..., 3, 3], ascending [..., 3] (Cardano)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    # Shift by the trace mean and scale for conditioning.
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    # det(B/p) / 2
    half_det = 0.5 * (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    half_det = jnp.clip(half_det, -1.0, 1.0)

    angle = jnp.arccos(half_det) / 3.0
    two_thirds_pi = 2.0943951023931953
    beta2 = jnp.cos(angle) * 2.0
    beta0 = jnp.cos(angle + two_thirds_pi) * 2.0
    beta1 = -(beta0 + beta2)

    ev0 = q + p * beta0
    ev1 = q + p * beta1
    ev2 = q + p * beta2

    # Degenerate (near-isotropic) case: all eigenvalues equal the trace mean.
    isotropic = p2 < 6.0 * _EPS
    ev0 = jnp.where(isotropic, q, ev0)
    ev1 = jnp.where(isotropic, q, ev1)
    ev2 = jnp.where(isotropic, q, ev2)
    return jnp.stack([ev0, ev1, ev2], axis=-1)


def _eigenvector(A, lam):
    """Eigenvector of symmetric [..., 3, 3] for eigenvalue lam [...]: the
    cross product of the two most independent rows of (A - lam I)."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
    return v / norm


def sym_eigh3(A):
    """Eigendecomposition of a batch of symmetric 3x3 matrices.

    Args:
      A: [..., 3, 3] symmetric.
    Returns:
      (evals [..., 3] ascending, evecs [..., 3, 3] with evecs[..., :, k] the
      k-th eigenvector). Robust to repeated eigenvalues (falls back to an
      orthonormal completion).
    """
    evals = _eigenvalues(A)
    v0 = _eigenvector(A, evals[..., 0])
    v2 = _eigenvector(A, evals[..., 2])
    # Middle eigenvector: orthogonal completion (robust when lam1 is repeated).
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True), _EPS))
    v1 = v1 / n1

    # Fully degenerate: identity basis.
    a_norm = jnp.sqrt(jnp.sum(A * A, axis=(-2, -1)))
    spread = evals[..., 2] - evals[..., 0]
    degen = spread <= 1e-9 * jnp.maximum(a_norm, 1.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    evecs = jnp.stack([v0, v1, v2], axis=-1)
    evecs = jnp.where(degen[..., None, None], eye, evecs)
    return evals, evecs
