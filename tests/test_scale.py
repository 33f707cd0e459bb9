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


def _cross_modal_world(n=8):
    seq = SyntheticStereoSequence(n_frames=n, rig=RIG, seed=3,
                                  cross_modal=True)
    return seq, [seq.frame(i) for i in range(n)]


class TestCrossModalSession:
    """The reference's flagship specialization driven end-to-end (VERDICT r4
    item 1): mono-per-camera VO + MI metric scale from the stereo baseline
    on a multispectral rig (Optimiser<ScaleState, ...>,
    optimisation.cpp:150-228, 436-537, 749)."""

    def _cfg(self):
        from uasl_motion_estimation_tpu.models import frontend as fe
        from uasl_motion_estimation_tpu.models.cross_modal import (
            CrossModalConfig,
        )
        from uasl_motion_estimation_tpu.models.mono_vo import MonoVOParams

        intr = geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv)
        return CrossModalConfig(
            vo=MonoVOParams(intr=intr),
            scale=ScaleConfig(intr=intr, baseline=RIG.baseline),
            matcher=fe.MatcherConfig(max_disparity=64),
            max_features=256,
        )

    def test_zncc_fails_cross_modal(self):
        """Negative control: intensity matching anti-correlates across the
        modalities, so the ZNCC matcher starves while MI matches — the
        regime the ScaleState machinery exists for."""
        from uasl_motion_estimation_tpu.models import frontend as fe
        from uasl_motion_estimation_tpu.ops import image as im

        seq, frames = _cross_modal_world(1)
        left, right = frames[0]
        xy, _, v0 = im.detect_features_grid(jnp.asarray(left, jnp.float32),
                                            max_features=128)
        cfg = fe.MatcherConfig(max_disparity=64)
        fr_z, _, v_zncc = fe.match_stereo(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            xy, v0, cfg)
        fr_m, _, v_mi = fe.match_stereo(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            xy, v0, cfg, use_mi=True)
        gt_map = seq.gt_disparity(0)
        f = np.asarray(xy)
        ix = np.clip(np.round(f[:, 0]).astype(int), 0, RIG.width - 1)
        iy = np.clip(np.round(f[:, 1]).astype(int), 0, RIG.height - 1)
        d_gt = gt_map[iy, ix]
        err_z = np.abs(np.asarray(xy[:, 0] - fr_z[:, 0]) - d_gt)
        err_m = np.abs(np.asarray(xy[:, 0] - fr_m[:, 0]) - d_gt)
        vz, vm = np.asarray(v_zncc), np.asarray(v_mi)
        assert vm.sum() > 30, vm.sum()
        assert np.median(err_m[vm]) < 1.0, np.median(err_m[vm])
        # ZNCC either starves or accepts garbage (anti-correlated peaks)
        assert vz.sum() < 0.3 * vm.sum() and (
            vz.sum() == 0 or np.median(err_z[vz]) > 5.0
        ), (vz.sum(), vm.sum())

    def test_session_recovers_metric_trajectory(self):
        from uasl_motion_estimation_tpu.models.cross_modal import (
            run_cross_modal,
        )
        from uasl_motion_estimation_tpu.utils.metrics import ate_rmse

        seq, frames = _cross_modal_world(8)
        res = run_cross_modal(frames, self._cfg(), seed=0)
        assert all(r["success"] for r in res.records)
        gt_speed = np.linalg.norm(
            np.diff(seq.poses[:, :3, 3], axis=0), axis=1)
        err = np.abs(res.scales - gt_speed) / gt_speed
        assert float(np.median(err)) < 0.02, err
        assert float(err.max()) < 0.06, err
        ate = float(ate_rmse(res.trajectory[:, :3, 3], seq.gt_positions()))
        assert ate < 0.06, ate

    def test_staged_engine_matches_per_frame_loop(self):
        """The staged single-dispatch session must agree with the per-frame
        loop (same global-index keys; vectorization-context float noise
        only) and keep the metric-scale accuracy."""
        from uasl_motion_estimation_tpu.models.cross_modal import (
            run_cross_modal,
            run_cross_modal_staged,
        )
        from uasl_motion_estimation_tpu.utils.metrics import ate_rmse

        seq, frames = _cross_modal_world(8)
        # quantize to the wire format for both engines
        wire = [(np.clip(l, 0, 255).astype(np.uint8).astype(np.float32),
                 np.clip(r, 0, 255).astype(np.uint8).astype(np.float32))
                for l, r in frames]
        cfg = self._cfg()
        res_s = run_cross_modal_staged(wire, cfg, seed=0, chunk=4)
        res_l = run_cross_modal(wire, cfg, seed=0)
        dev = np.max(np.abs(res_s.trajectory[:, :3, 3]
                            - res_l.trajectory[:, :3, 3]))
        assert dev < 0.05, dev
        gt_speed = np.linalg.norm(
            np.diff(seq.poses[:, :3, 3], axis=0), axis=1)
        err = np.abs(res_s.scales - gt_speed) / gt_speed
        assert float(np.median(err)) < 0.02, err
        ate = float(ate_rmse(res_s.trajectory[:, :3, 3],
                             seq.gt_positions()))
        assert ate < 0.06, ate

    def test_recovers_from_bad_init_cross_modal(self):
        """The MI optimiser itself (not the matcher init) must pull a
        deliberately wrong scale to the truth across modalities — the
        test-mode convergence the reference logs (optimisation.cpp:35-46)
        asserted instead of eyeballed. Structure = detected corners with
        exact renderer depths (the representative feature population; a
        ground-plane-only set has a foreshortening-biased MI objective),
        far inits handled by the coarse log-space pre-search + LM."""
        from uasl_motion_estimation_tpu.ops import image as im

        seq, frames = _cross_modal_world(1)
        left, right = map(jnp.asarray, frames[0])
        feats, _, v0 = im.detect_features_grid(left, max_features=256,
                                               quality_level=1e-4)
        gtd = seq.gt_disparity(0)
        f = np.asarray(feats)
        ix = np.clip(np.round(f[:, 0]).astype(int), 0, RIG.width - 1)
        iy = np.clip(np.round(f[:, 1]).astype(int), 0, RIG.height - 1)
        d = gtd[iy, ix]
        z = np.where(d > 1e-3, RIG.fu * RIG.baseline
                     / np.maximum(d, 1e-3), 0.0)
        ok = np.asarray(v0) & (z > 2) & (z < 40)
        X = np.stack([(f[:, 0] - RIG.cu) * z / RIG.fu,
                      (f[:, 1] - RIG.cv) * z / RIG.fv, z], -1)
        s_gt = 1.4
        cfg = ScaleConfig(
            intr=geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv),
            baseline=RIG.baseline,
            coarse_candidates=13,  # far inits need the coarse pre-search
        )
        pts = jnp.asarray((X / s_gt).astype(np.float32))
        for s0 in (0.5, 2.8):
            s, _ = estimate_scale(left, right, pts, jnp.asarray(ok),
                                  jnp.asarray(s0), cfg)
            assert abs(float(s) - s_gt) / s_gt < 0.06, (s0, float(s))


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
