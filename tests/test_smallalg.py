"""Unrolled small-matrix linalg vs numpy/LAPACK oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov2slam_tpu.core import smallalg


RNG = np.random.default_rng(7)


def test_solve_spd_batched():
    for n in (3, 6, 9):
        A = RNG.standard_normal((64, n, n)).astype(np.float32)
        H = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(n, dtype=np.float32)
        g = RNG.standard_normal((64, n)).astype(np.float32)
        x = np.asarray(smallalg.solve_spd(jnp.asarray(H), jnp.asarray(g)))
        x_ref = np.linalg.solve(H, g[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


def test_inv3():
    A = RNG.standard_normal((128, 3, 3)).astype(np.float32)
    A += np.eye(3, dtype=np.float32) * 2.0
    inv = np.asarray(smallalg.inv3(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=2e-3, atol=1e-4)


def test_eigh_jacobi():
    for n in (3, 4, 6, 9):
        A = RNG.standard_normal((32, n, n)).astype(np.float32)
        S = 0.5 * (A + A.transpose(0, 2, 1))
        w, V = smallalg.eigh_jacobi(jnp.asarray(S))
        w = np.asarray(w)
        V = np.asarray(V)
        w_ref = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(w, w_ref, rtol=1e-4, atol=1e-4)
        # eigen equation + orthonormality
        err = S @ V - V * w[:, None, :]
        assert np.abs(err).max() < 1e-3
        I = V.transpose(0, 2, 1) @ V
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(n), I.shape),
                                   atol=1e-4)


def test_smallest_eigvec_nullspace():
    # construct rank-8 9x9 PSD matrices with a known null vector
    B = RNG.standard_normal((16, 8, 9)).astype(np.float32)
    AtA = np.einsum("bij,bik->bjk", B, B)
    v = np.asarray(smallalg.smallest_eigvec(jnp.asarray(AtA)))
    resid = np.einsum("bij,bj->bi", AtA, v)
    assert np.abs(resid).max() < 1e-2 * np.abs(AtA).max()


def test_svd3():
    E = RNG.standard_normal((64, 3, 3)).astype(np.float32)
    U, s, Vt = smallalg.svd3(jnp.asarray(E))
    U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
    s_ref = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)
    recon = U @ (s[..., :, None] * Vt)
    np.testing.assert_allclose(recon, E, rtol=1e-2, atol=2e-3)


def test_essential_project():
    E = RNG.standard_normal((32, 3, 3)).astype(np.float32)
    P = np.asarray(smallalg.essential_project(jnp.asarray(E)))
    s = np.linalg.svd(P, compute_uv=False)
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(s[:, 1], 1.0, atol=1e-3)
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-3)
    # projection must match the SVD-based oracle
    u, sv, vt = np.linalg.svd(E)
    P_ref = u @ (np.diag([1.0, 1.0, 0.0])[None] * np.ones((32, 1, 1))) @ vt
    # signs of singular vectors may differ; compare as matrices
    np.testing.assert_allclose(P, P_ref.astype(np.float32), atol=5e-3)


def _rand_rotations(n):
    q = RNG.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], axis=-2).astype(np.float32)


def test_procrustes_rotation():
    R_true = _rand_rotations(32)
    a = RNG.standard_normal((32, 10, 3)).astype(np.float32)
    b = np.einsum("bij,bnj->bni", R_true, a)
    # attitude profile M = sum_i b_i a_i^T
    M = np.einsum("bni,bnj->bij", b, a)
    R = np.asarray(smallalg.procrustes_rotation(jnp.asarray(M)))
    np.testing.assert_allclose(R, R_true, atol=2e-3)
    det = np.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-3)


def test_procrustes_noisy():
    R_true = _rand_rotations(8)
    a = RNG.standard_normal((8, 50, 3)).astype(np.float32)
    b = np.einsum("bij,bnj->bni", R_true, a)
    b += 0.01 * RNG.standard_normal(b.shape).astype(np.float32)
    M = np.einsum("bni,bnj->bij", b, a)
    R = np.asarray(smallalg.procrustes_rotation(jnp.asarray(M)))
    # proper rotation close to truth
    np.testing.assert_allclose(R, R_true, atol=2e-2)
