"""Rotation-algebra parity tests (SURVEY.md section 4, tier 1).

Cross-validates against closed forms, autodiff, and OpenCV's Rodrigues
(the reference's own backend for exp_map_Mat/log_map_Mat).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uasl_motion_estimation_tpu.ops import lie

RNG = np.random.default_rng(0)


def random_rpy(n=32, scale=1.2):
    return jnp.asarray(RNG.uniform(-scale, scale, size=(n, 3)), jnp.float32)


def random_rotvec(n=32, max_angle=3.0):
    axis = RNG.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = RNG.uniform(-max_angle, max_angle, size=(n, 1))
    return jnp.asarray(axis * angles, jnp.float32)


class TestEuler:
    def test_orthonormal(self):
        R = lie.euler_to_R(random_rpy())
        eye = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(eye, (32, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_round_trip(self):
        rpy = random_rpy(scale=1.2)  # stay away from pitch = +-pi/2
        back = lie.R_to_euler(lie.euler_to_R(rpy))
        np.testing.assert_allclose(back, rpy, atol=1e-5)

    def test_derivatives_match_autodiff(self):
        rpy = random_rpy(8)
        dRdr, dRdp, dRdy = lie.euler_dR(rpy)
        J = jax.vmap(jax.jacfwd(lie.euler_to_R))(rpy)  # (n, 3, 3, 3)
        np.testing.assert_allclose(dRdr, J[..., 0], atol=1e-4)
        np.testing.assert_allclose(dRdp, J[..., 1], atol=1e-4)
        np.testing.assert_allclose(dRdy, J[..., 2], atol=1e-4)

    def test_quat_euler_consistency(self):
        rpy = random_rpy()
        q = lie.euler_to_quat(rpy)
        # Standard quat matrix is the transpose of the euler DCM (same as the
        # reference's Euler::getR3 vs Quat::getR3 convention split).
        np.testing.assert_allclose(
            lie.quat_to_R(q), jnp.swapaxes(lie.euler_to_R(rpy), -1, -2), atol=1e-5
        )
        np.testing.assert_allclose(lie.quat_to_euler(q), rpy, atol=1e-5)


class TestQuat:
    def test_mul_matches_matrix_product(self):
        q1, q2 = (lie.euler_to_quat(random_rpy()) for _ in range(2))
        R12 = lie.quat_to_R(lie.quat_mul(q1, q2))
        np.testing.assert_allclose(R12, lie.quat_to_R(q1) @ lie.quat_to_R(q2), atol=1e-5)

    def test_R_round_trip(self):
        q = lie.quat_normalize(jnp.asarray(RNG.normal(size=(64, 4)), jnp.float32))
        q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
        back = lie.R_to_quat(lie.quat_to_R(q))
        np.testing.assert_allclose(back, q, atol=1e-4)

    def test_R_round_trip_near_pi(self):
        # 180-degree rotations exercise the non-trace branches of R_to_quat.
        v = random_rotvec(16, max_angle=np.pi - 1e-3)
        v = v / np.linalg.norm(np.asarray(v), axis=-1, keepdims=True) * (np.pi - 1e-3)
        R = lie.so3_exp(jnp.asarray(v, jnp.float32))
        np.testing.assert_allclose(lie.quat_to_R(lie.R_to_quat(R)), R, atol=1e-4)

    def test_conj_is_inverse(self):
        q = lie.euler_to_quat(random_rpy())
        ident = lie.quat_mul(q, lie.quat_conj(q))
        np.testing.assert_allclose(ident[..., 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(ident[..., 1:], 0.0, atol=1e-5)

    def test_rotate_matches_matrix(self):
        q = lie.euler_to_quat(random_rpy(8))
        v = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(
            lie.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", lie.quat_to_R(q), v),
            atol=1e-5,
        )


class TestExpLog:
    def test_so3_exp_matches_opencv_rodrigues(self):
        for v in np.asarray(random_rotvec(8)):
            R_cv, _ = cv2.Rodrigues(v.astype(np.float64))
            np.testing.assert_allclose(
                lie.so3_exp(jnp.asarray(v, jnp.float32)), R_cv, atol=1e-5
            )

    def test_so3_log_matches_opencv_rodrigues(self):
        for v in np.asarray(random_rotvec(8, max_angle=3.0)):
            R_cv, _ = cv2.Rodrigues(v.astype(np.float64))
            np.testing.assert_allclose(
                lie.so3_log(jnp.asarray(R_cv, jnp.float32)), v, atol=1e-4
            )

    def test_round_trips(self):
        v = random_rotvec()
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(v)), v, atol=1e-4)
        np.testing.assert_allclose(lie.quat_log(lie.quat_exp(v)), v, atol=1e-4)
        np.testing.assert_allclose(
            lie.quat_to_R(lie.quat_exp(v)), lie.so3_exp(v), atol=1e-5
        )

    def test_small_angle(self):
        v = jnp.asarray([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]], jnp.float32)
        R = lie.so3_exp(v)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(lie.quat_log(lie.quat_exp(v)))))

    def test_right_jacobian_finite_diff(self):
        v = np.asarray(random_rotvec(4, max_angle=2.0), np.float64)
        eps = 1e-3  # cv2.Rodrigues flushes tinier rotations to zero
        for vi in v:
            Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(vi, jnp.float32)))
            for k in range(3):
                dv = np.zeros(3)
                dv[k] = eps
                R1, _ = cv2.Rodrigues(vi + dv)
                R0, _ = cv2.Rodrigues(vi)
                delta, _ = cv2.Rodrigues(R0.T @ R1)
                np.testing.assert_allclose(delta.ravel() / eps, Jr[:, k], atol=1e-2)


def test_skew():
    v = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
    u = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", lie.skew(v), u), jnp.cross(v, u), atol=1e-5
    )


def test_jit_and_vmap_compatible():
    rpy = random_rpy(16)
    jit_fn = jax.jit(lambda e: lie.R_to_euler(lie.euler_to_R(e)))
    np.testing.assert_allclose(jit_fn(rpy), rpy, atol=1e-5)


class TestFrameConversion:
    def test_roundtrip(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(lie.opencv_to_xyz(lie.xyz_to_opencv(v))),
            np.asarray(v), atol=1e-6,
        )

    def test_tref_axes(self):
        # XYZ forward (x) becomes OpenCV forward (z)
        fwd = np.asarray(lie.xyz_to_opencv(jnp.asarray([1.0, 0.0, 0.0])))
        np.testing.assert_allclose(fwd, [0.0, 0.0, 1.0], atol=1e-12)
        # XYZ up (z) becomes OpenCV -y (down axis negated)
        up = np.asarray(lie.xyz_to_opencv(jnp.asarray([0.0, 0.0, 1.0])))
        np.testing.assert_allclose(up, [0.0, -1.0, 0.0], atol=1e-12)

    def test_quat_conversion_matches_matrix(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=3), jnp.float32)
        q = lie.quat_exp(v)
        R = lie.quat_to_R(q)
        q2 = lie.quat_xyz_to_opencv(q)
        R2 = np.asarray(lie.quat_to_R(lie.quat_normalize(q2)))
        np.testing.assert_allclose(R2, lie.TREF @ np.asarray(R), atol=1e-5)
