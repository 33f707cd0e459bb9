"""MI scale-optimiser tests (SURVEY.md section 3.4 semantics): on a rendered
stereo pair with exact geometry, maximizing patch MI over the scale must
recover the true metric scale from a wrong initialization."""

import jax.numpy as jnp
import numpy as np
import pytest

from uasl_motion_estimation_tpu.models.scale import ScaleConfig, estimate_scale
from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.solvers.lm import LMConfig, lm_solve
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

RIG = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                height=192, width=320)


@pytest.fixture(scope="module")
def stereo_pair_and_points():
    seq = SyntheticStereoSequence(n_frames=1, rig=RIG, seed=2)
    left, right = seq.frame(0)
    # ground-plane points with exact depth: pixel (u, v) below the horizon
    # sees the ground (y=1.7) at Z = 1.7 * fv / (v - cv)
    rng = np.random.default_rng(0)
    us = rng.uniform(60, 260, 60)
    vs = rng.uniform(130, 180, 60)
    z = 1.7 * RIG.fv / (vs - RIG.cv)
    x = (us - RIG.cu) * z / RIG.fu
    y = (vs - RIG.cv) * z / RIG.fv
    pts_true = np.stack([x, y, z], -1).astype(np.float32)
    return jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts_true)


class TestScaleEstimation:
    def test_recovers_scale(self, stereo_pair_and_points):
        left, right, pts_true = stereo_pair_and_points
        s_gt = 1.6
        pts_unit = pts_true / s_gt  # up-to-scale geometry
        cfg = ScaleConfig(
            intr=geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv),
            baseline=RIG.baseline,
        )
        valid = jnp.ones(pts_unit.shape[0], bool)
        s, res = estimate_scale(left, right, pts_unit, valid,
                                jnp.asarray(1.2), cfg)
        assert abs(float(s) - s_gt) < 0.08, (float(s), int(res.stop))

    def test_weighting_variant_runs(self, stereo_pair_and_points):
        left, right, pts_true = stereo_pair_and_points
        cfg = ScaleConfig(
            intr=geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv),
            baseline=RIG.baseline, weighting=True,
        )
        valid = jnp.ones(pts_true.shape[0], bool)
        s, _ = estimate_scale(left, right, pts_true / 1.5, valid,
                              jnp.asarray(1.1), cfg)
        assert abs(float(s) - 1.5) < 0.12, float(s)


class TestLMMaximize:
    def test_maximizes_quadratic(self):
        """Regression for the maximization step sign: maximize -(x-3)^2."""

        def normal_eq(x):
            r = x[0] - 3.0
            J = jnp.asarray([[1.0]])
            # objective f = -(x-3)^2; gradient = -2r -> e = -2r (uphill)
            return 2.0 * J, jnp.asarray([-2.0 * r]), -(r * r)

        res = lm_solve(normal_eq, jnp.asarray([0.0]),
                       LMConfig(minimize=False, max_iter=30))
        # stops via SMALL_INCREMENT at incr_tol * |x| ~= 3e-3
        assert abs(float(res.x[0]) - 3.0) < 5e-3, float(res.x[0])
        res_gn = lm_solve(normal_eq, jnp.asarray([0.0]),
                          LMConfig(minimize=False, use_lm=False, max_iter=30))
        assert abs(float(res_gn.x[0]) - 3.0) < 1e-5, float(res_gn.x[0])
