"""Property tests for SO(3)/SE(3) — mirrors the intent of the vendored Sophus
test suite the reference relies on (Thirdparty/Sophus/test/core/test_se3.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov2slam_tpu.core import lie

RNG = np.random.default_rng(0)


def random_w(n, scale=2.0):
    w = RNG.normal(size=(n, 3)) * scale
    # keep |w| < pi so log(exp(w)) == w is well-posed
    nrm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = w / np.maximum(1.0, nrm / 2.9)
    return w.astype(np.float32)


def test_so3_exp_log_roundtrip():
    w = random_w(256, scale=1.0)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=2e-5)


def test_so3_exp_orthonormal():
    w = random_w(64)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_small_angle():
    w = np.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)
    w2 = np.asarray(lie.so3_log(R))
    assert np.all(np.isfinite(w2))


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-7]:
        w = (axis * theta).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(R))
        # near pi, +/- axis*theta both valid; compare rotations
        R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)  # f32 near pi


def test_se3_exp_log_roundtrip():
    xi = RNG.normal(size=(128, 6))
    # keep |omega| < pi so the log is the principal one
    wn = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] /= np.maximum(1.0, wn / 2.9)
    xi = xi.astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=3e-5)


def test_se3_compose_inverse():
    xi = RNG.normal(size=(32, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    Tinv = lie.se3_inverse(T)
    I = lie.se3_compose(T, Tinv)
    np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)


def test_se3_apply_matches_matrix():
    xi = RNG.normal(size=(8, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    x = RNG.normal(size=(8, 3)).astype(np.float32)
    y = np.asarray(lie.se3_apply(T, jnp.asarray(x)))
    M = np.asarray(T.matrix())
    y_ref = np.einsum("nij,nj->ni", M[:, :3, :3], x) + M[:, :3, 3]
    np.testing.assert_allclose(y, y_ref, atol=1e-6)


def test_se3_boxplus_left_first_order():
    """exp(eps)∘T ≈ T + left-jacobian step: check against numeric compose."""
    xi = RNG.normal(size=(6,)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    eps = (RNG.normal(size=(6,)) * 1e-3).astype(np.float32)
    T2 = lie.se3_boxplus_left(T, jnp.asarray(eps))
    delta = lie.se3_log(lie.se3_compose(T2, lie.se3_inverse(T)))
    np.testing.assert_allclose(np.asarray(delta), eps, atol=1e-5)


def test_quat_roundtrip():
    w = random_w(256)
    R = lie.so3_exp(jnp.asarray(w))
    q = lie.quat_from_mat(R)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5)
    R2 = lie.mat_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_vs_scipy():
    from scipy.spatial.transform import Rotation
    w = random_w(64, scale=2.5)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)), np.float64)
    q = np.asarray(lie.quat_from_mat(jnp.asarray(R, jnp.float32)))
    q_ref = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    # canonical sign w>=0
    q_ref = np.where(q_ref[:, 3:4] < 0, -q_ref, q_ref)
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_adjoint():
    """Ad_T xi == log(T exp(xi) T^-1) for small xi."""
    xi0 = RNG.normal(size=(6,)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi0))
    xi = (RNG.normal(size=(6,)) * 1e-3).astype(np.float32)
    lhs = np.asarray(lie.se3_adjoint(T) @ jnp.asarray(xi))
    rhs = np.asarray(
        lie.se3_log(lie.se3_compose(lie.se3_compose(T, lie.se3_exp(jnp.asarray(xi))), lie.se3_inverse(T)))
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(lambda w: lie.so3_log(lie.so3_exp(w)))
    w = jnp.asarray(random_w(16, 0.5))
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-5)
