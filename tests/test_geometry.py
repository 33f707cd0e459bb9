"""Geometry tests: projection/triangulation round trips, pose algebra,
covariance propagation vs Monte-Carlo (SURVEY.md section 4, tier 1)."""

import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.ops import lie

RNG = np.random.default_rng(1)

INTR = geo.Intrinsics(fu=718.856, fv=718.856, cu=607.19, cv=185.22)  # KITTI-like
BASELINE = 0.5372


def random_pose(scale_t=1.0):
    rpy = RNG.uniform(-0.5, 0.5, 3)
    t = RNG.normal(size=3) * scale_t
    return geo.Pose(
        q=lie.euler_to_quat(jnp.asarray(rpy, jnp.float32)),
        t=jnp.asarray(t, jnp.float32),
    )


def random_points(n=100, depth=(4.0, 40.0)):
    z = RNG.uniform(*depth, n)
    x = RNG.uniform(-0.5, 0.5, n) * z
    y = RNG.uniform(-0.3, 0.3, n) * z
    return jnp.asarray(np.stack([x, y, z], -1), jnp.float32)


class TestHomogeneous:
    def test_round_trip(self):
        p = jnp.asarray(RNG.normal(size=(7, 3)), jnp.float32)
        np.testing.assert_allclose(geo.from_homogeneous(geo.to_homogeneous(p)), p,
                                   atol=1e-6)

    def test_scale_invariance(self):
        ph = jnp.asarray([[2.0, 4.0, 2.0], [-3.0, 9.0, -3.0]], jnp.float32)
        np.testing.assert_allclose(geo.from_homogeneous(ph),
                                   [[1.0, 2.0], [1.0, -3.0]], atol=1e-6)


class TestProjection:
    def test_triangulate_project_round_trip(self):
        pts = random_points()
        left = geo.project(pts, INTR)
        right = geo.project(pts, INTR, baseline_shift=BASELINE)
        back = geo.triangulate_disparity(left, right, INTR, INTR, BASELINE)
        np.testing.assert_allclose(back, pts, rtol=2e-3, atol=1e-2)

    def test_projection_formula(self):
        pt = jnp.asarray([[1.0, 2.0, 10.0]], jnp.float32)
        uv = geo.project(pt, INTR)
        np.testing.assert_allclose(
            uv, [[718.856 * 0.1 + 607.19, 718.856 * 0.2 + 185.22]], rtol=1e-5
        )

    def test_negative_disparity_clamped(self):
        # matches with d <= 0 must produce finite far-away points
        left = jnp.asarray([[100.0, 50.0]], jnp.float32)
        right = jnp.asarray([[150.0, 50.0]], jnp.float32)  # negative disparity
        pt = geo.triangulate_disparity(left, right, INTR, INTR, BASELINE)
        assert np.all(np.isfinite(np.asarray(pt)))


class TestPose:
    def test_compose_matches_matrix_product(self):
        p1, p2 = random_pose(), random_pose()
        np.testing.assert_allclose(
            p1.compose(p2).matrix(), p1.matrix() @ p2.matrix(), atol=1e-5
        )

    def test_inverse(self):
        p = random_pose()
        ident = p.compose(p.inverse()).matrix()
        np.testing.assert_allclose(ident, jnp.eye(4), atol=1e-5)

    def test_apply_matches_matrix(self):
        p = random_pose()
        pts = random_points(20)
        ph = geo.to_homogeneous(pts) @ p.matrix().T
        np.testing.assert_allclose(p.apply(pts), ph[..., :3], atol=1e-4)

    def test_matrix_round_trip(self):
        p = random_pose()
        p2 = geo.pose_from_matrix(p.matrix())
        np.testing.assert_allclose(p2.matrix(), p.matrix(), atol=1e-5)


class TestCovariance:
    """Monte-Carlo validation of first-order covariance propagation
    (replaces the reference's untested hand-coded jacobians,
    feature_types.cpp:172-251)."""

    N_MC = 4000
    SIG = 0.01

    def _sample_perturbed(self, p):
        xi = RNG.normal(size=(self.N_MC, 6)) * self.SIG
        qs, ts = [], []
        for x in xi:
            pp = geo._perturb(p, jnp.asarray(x, jnp.float32))
            qs.append(np.asarray(pp.q))
            ts.append(np.asarray(pp.t))
        return np.asarray(qs), np.asarray(ts), self.SIG**2 * np.eye(6)

    def test_compose_covariance_monte_carlo(self):
        p1, p2 = random_pose(), random_pose()
        cov = jnp.asarray(self.SIG**2 * np.eye(6), jnp.float32)
        out = geo.compose_with_covariance(
            p1._replace(cov=cov), p2._replace(cov=cov)
        )

        # Monte-Carlo: perturb both poses, compose, measure tangent spread.
        deltas = []
        for _ in range(self.N_MC):
            x1 = jnp.asarray(RNG.normal(size=6) * self.SIG, jnp.float32)
            x2 = jnp.asarray(RNG.normal(size=6) * self.SIG, jnp.float32)
            res = geo._perturb(p1, x1).compose(geo._perturb(p2, x2))
            dq = lie.quat_mul(lie.quat_conj(out.q), res.q)
            dt = lie.quat_rotate(lie.quat_conj(out.q), res.t - out.t)
            deltas.append(np.concatenate([np.asarray(dt), np.asarray(lie.quat_log(dq))]))
        mc_cov = np.cov(np.asarray(deltas).T)
        np.testing.assert_allclose(np.asarray(out.cov), mc_cov, atol=3e-5)

    def test_numpy_transport_parity_with_autodiff(self):
        """The host-side float64 adjoint helpers (compose/invert_with_
        covariance_np, used by the engines' pose-chain composition) must
        agree with the autodiff jnp versions they mirror."""
        # local RNG: the Monte-Carlo tests' tolerances depend on the shared
        # module RNG's draw sequence, so don't consume from it here
        rng = np.random.default_rng(11)
        mk = lambda: geo.Pose(
            q=lie.euler_to_quat(jnp.asarray(rng.uniform(-0.5, 0.5, 3),
                                            jnp.float32)),
            t=jnp.asarray(rng.normal(size=3), jnp.float32),
        )
        p1, p2 = mk(), mk()
        C1 = np.diag(rng.uniform(0.5, 2.0, 6)).astype(np.float64) * 1e-4
        C2 = np.diag(rng.uniform(0.5, 2.0, 6)).astype(np.float64) * 1e-4
        out = geo.compose_with_covariance(
            p1._replace(cov=jnp.asarray(C1, jnp.float32)),
            p2._replace(cov=jnp.asarray(C2, jnp.float32)),
        )
        T1 = np.asarray(p1.matrix(), np.float64)
        T2 = np.asarray(p2.matrix(), np.float64)
        T_np, C_np = geo.compose_with_covariance_np(T1, C1, T2, C2)
        np.testing.assert_allclose(T_np, np.asarray(out.matrix()), atol=1e-5)
        np.testing.assert_allclose(C_np, np.asarray(out.cov),
                                   atol=1e-8, rtol=1e-3)

        inv = geo.invert_with_covariance(
            p1._replace(cov=jnp.asarray(C1, jnp.float32)))
        Ti_np, Ci_np = geo.invert_with_covariance_np(T1, C1)
        np.testing.assert_allclose(Ti_np, np.asarray(inv.matrix()), atol=1e-5)
        np.testing.assert_allclose(Ci_np, np.asarray(inv.cov),
                                   atol=1e-8, rtol=1e-3)

    def test_invert_covariance_monte_carlo(self):
        p = random_pose()
        cov = jnp.asarray(self.SIG**2 * np.eye(6), jnp.float32)
        out = geo.invert_with_covariance(p._replace(cov=cov))
        deltas = []
        for _ in range(self.N_MC):
            x = jnp.asarray(RNG.normal(size=6) * self.SIG, jnp.float32)
            res = geo._perturb(p, x).inverse()
            dq = lie.quat_mul(lie.quat_conj(out.q), res.q)
            dt = lie.quat_rotate(lie.quat_conj(out.q), res.t - out.t)
            deltas.append(np.concatenate([np.asarray(dt), np.asarray(lie.quat_log(dq))]))
        mc_cov = np.cov(np.asarray(deltas).T)
        np.testing.assert_allclose(np.asarray(out.cov), mc_cov, atol=3e-5)

    def test_scale_covariance(self):
        p = random_pose()
        cov = jnp.asarray(self.SIG**2 * np.eye(6), jnp.float32)
        out = geo.scale_pose_with_covariance(p._replace(cov=cov), jnp.float32(2.0),
                                             jnp.float32(1e-4))
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(p.t) * 2.0, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(np.asarray(out.cov)) > -1e-7)
        # translation variance must grow: s^2 * sig^2 + |t|^2-weighted scale var
        assert np.trace(np.asarray(out.cov)[:3, :3]) > 4 * 3 * self.SIG**2 - 1e-6


def test_relative_scale():
    pts = random_points(50)
    scaled = pts * 2.5
    s = geo.relative_scale(scaled, pts)
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)
    mask = jnp.ones(50, bool).at[10:20].set(False)
    s2 = geo.relative_scale(scaled, pts, mask)
    np.testing.assert_allclose(float(s2), 2.5, rtol=1e-4)
