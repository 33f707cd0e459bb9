"""Solver tests on synthetic geometry (SURVEY.md section 4, tier 2):
exact projections -> pose recovery, outlier injection -> RANSAC inlier sets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uasl_motion_estimation_tpu.models.stereo_vo import (
    StereoVOParams,
    stereo_vo_batch,
    stereo_vo_solve,
)
from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.ops import lie

RNG = np.random.default_rng(7)

INTR = geo.Intrinsics(fu=718.856, fv=718.856, cu=607.19, cv=185.22)
PARAMS = StereoVOParams(intr1=INTR, intr2=INTR, baseline=0.5372)


def make_scene(n=200, state=None, noise=0.0, n_outliers=0, pad_to=None):
    """Synthetic quad matches: 3D points observed in two stereo pairs related
    by the ground-truth state [rpy, t] (previous -> current frame)."""
    if state is None:
        state = np.array([0.01, -0.02, 0.015, 0.05, -0.03, 0.8])
    z = RNG.uniform(5.0, 40.0, n)
    x = RNG.uniform(-0.45, 0.45, n) * z
    y = RNG.uniform(-0.25, 0.25, n) * z
    pts_prev = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)

    st = jnp.asarray(state, jnp.float32)
    R = lie.euler_to_R(st[:3])
    pts_cur = pts_prev @ R + st[3:6]

    f1 = geo.project(pts_prev, INTR)
    f2 = geo.project(pts_prev, INTR, baseline_shift=PARAMS.baseline)
    f3 = geo.project(pts_cur, INTR)
    f4 = geo.project(pts_cur, INTR, baseline_shift=PARAMS.baseline)
    matches = np.stack([f1, f2, f3, f4], axis=1).astype(np.float32)

    if noise > 0:
        matches += RNG.normal(scale=noise, size=matches.shape).astype(np.float32)

    outlier_idx = RNG.choice(n, size=n_outliers, replace=False) if n_outliers else []
    for i in outlier_idx:
        matches[i, 2:4] += RNG.uniform(20, 80, size=(2, 2)).astype(np.float32)

    n_total = pad_to or n
    padded = np.zeros((n_total, 4, 2), np.float32)
    padded[:n] = matches
    valid = np.zeros(n_total, bool)
    valid[:n] = True
    return (
        jnp.asarray(padded),
        jnp.asarray(valid),
        jnp.asarray(state, jnp.float32),
        np.asarray(outlier_idx),
    )


class TestNoiseFree:
    def test_recovers_exact_pose_gn(self):
        matches, valid, gt, _ = make_scene()
        res = stereo_vo_solve(matches, valid, jax.random.key(0), PARAMS)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=1e-3)

    def test_recovers_exact_pose_lm(self):
        matches, valid, gt, _ = make_scene()
        params = PARAMS._replace(use_lm=True)
        res = stereo_vo_solve(matches, valid, jax.random.key(0), params)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=1e-3)

    def test_motion_matrix(self):
        matches, valid, gt, _ = make_scene()
        res = stereo_vo_solve(matches, valid, jax.random.key(0), PARAMS)
        R = lie.euler_to_R(gt[:3]).T
        expect = np.eye(4, dtype=np.float32)
        expect[:3, :3] = np.asarray(R)
        expect[:3, 3] = np.asarray(gt[3:6])
        np.testing.assert_allclose(np.asarray(res.motion), expect, atol=2e-3)

    def test_no_ransac_path(self):
        matches, valid, gt, _ = make_scene()
        res = stereo_vo_solve(
            matches, valid, jax.random.key(0), PARAMS._replace(ransac=False)
        )
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=1e-3)

    def test_nonzero_rotation(self):
        state = np.array([0.08, 0.12, -0.1, 0.4, 0.2, 1.5])
        matches, valid, gt, _ = make_scene(state=state)
        res = stereo_vo_solve(matches, valid, jax.random.key(1), PARAMS)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=2e-3)


class TestRobustness:
    def test_outliers_rejected(self):
        matches, valid, gt, outlier_idx = make_scene(n=150, noise=0.3, n_outliers=30)
        res = stereo_vo_solve(matches, valid, jax.random.key(2), PARAMS)
        assert bool(res.success)
        inl = np.asarray(res.inlier_mask)
        # no injected outlier may survive as inlier
        assert not inl[outlier_idx].any()
        # most clean matches kept
        clean = np.setdiff1d(np.arange(150), outlier_idx)
        assert inl[clean].mean() > 0.8
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=0.02)

    def test_noise_only_accuracy(self):
        matches, valid, gt, _ = make_scene(n=300, noise=0.5)
        res = stereo_vo_solve(matches, valid, jax.random.key(3), PARAMS)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.state)[3:], np.asarray(gt)[3:],
                                   atol=0.03)
        np.testing.assert_allclose(np.asarray(res.state)[:3], np.asarray(gt)[:3],
                                   atol=5e-3)

    def test_padding_invariance(self):
        matches, valid, gt, _ = make_scene(n=100, pad_to=256)
        res = stereo_vo_solve(matches, valid, jax.random.key(4), PARAMS)
        assert bool(res.success)
        assert int(res.n_inliers) <= 100
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(gt), atol=2e-3)


class TestFailureContract:
    """The reference returns false and keeps the identity pose on degenerate
    input (process, cpp:41, 84-91); success=False is the equivalent."""

    def test_too_few_matches(self):
        matches, valid, _, _ = make_scene(n=30, pad_to=64)
        valid = valid & (jnp.arange(64) < 4)  # only 4 usable
        res = stereo_vo_solve(matches, valid, jax.random.key(5), PARAMS)
        assert not bool(res.success)

    def test_all_invalid(self):
        matches = jnp.zeros((64, 4, 2), jnp.float32)
        valid = jnp.zeros(64, bool)
        res = stereo_vo_solve(matches, valid, jax.random.key(6), PARAMS)
        assert not bool(res.success)
        assert np.all(np.isfinite(np.asarray(res.state)))


class TestBatched:
    def test_vmap_over_frames(self):
        states = [
            np.array([0.01, -0.02, 0.015, 0.05, -0.03, 0.8]),
            np.array([-0.02, 0.01, 0.03, -0.1, 0.02, 1.2]),
            np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5]),
        ]
        ms, vs, gts = [], [], []
        for s in states:
            m, v, g, _ = make_scene(n=128, state=s)
            ms.append(m), vs.append(v), gts.append(g)
        keys = jax.random.split(jax.random.key(7), 3)
        res = stereo_vo_batch(jnp.stack(ms), jnp.stack(vs), keys, PARAMS)
        assert res.state.shape == (3, 6)
        assert bool(jnp.all(res.success))
        np.testing.assert_allclose(np.asarray(res.state), np.stack(gts), atol=2e-3)


def test_deterministic_given_key():
    matches, valid, _, _ = make_scene(n=120, noise=0.3, n_outliers=20)
    r1 = stereo_vo_solve(matches, valid, jax.random.key(9), PARAMS)
    r2 = stereo_vo_solve(matches, valid, jax.random.key(9), PARAMS)
    np.testing.assert_array_equal(np.asarray(r1.state), np.asarray(r2.state))
    np.testing.assert_array_equal(np.asarray(r1.inlier_mask), np.asarray(r2.inlier_mask))


class TestHypothesisSolvers:
    """The three hypothesis modes (closed-form triad seed, Grunert P3P seed,
    legacy pure-GN) must all recover the pose (BASELINE config 1 names P3P;
    the triad is the default fast path)."""

    @pytest.mark.parametrize("solver", ["3pt", "p3p", "gn"])
    def test_modes_recover_pose(self, solver):
        matches, valid, state, _ = make_scene(noise=0.2, n_outliers=30)
        params = PARAMS._replace(hyp_solver=solver)
        res = stereo_vo_solve(matches, valid, jax.random.key(3), params)
        assert bool(res.success), solver
        np.testing.assert_allclose(np.asarray(res.state), np.asarray(state),
                                   atol=5e-3, err_msg=solver)

    def test_triad_seed_beats_zero_init_iteration_budget(self):
        """With only 2 GN polish iterations the closed-form seed must still
        classify inliers correctly; the legacy solver needs ~12."""
        matches, valid, state, outliers = make_scene(noise=0.1, n_outliers=40)
        params = PARAMS._replace(hyp_solver="3pt", ransac_gn_iters=2)
        res = stereo_vo_solve(matches, valid, jax.random.key(5), params)
        assert bool(res.success)
        inl = np.asarray(res.inlier_mask)
        assert inl[outliers].sum() <= 2
        assert inl.sum() >= 120
