"""Golden-sequence integration test on the exactly-rendered synthetic world
(SURVEY.md section 4, tier 3 — no datasets are available in this environment)."""

import numpy as np
import pytest

from uasl_motion_estimation_tpu.models.pipeline import OdometryPipeline, default_config
from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.utils import metrics
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    CorruptionConfig,
    SyntheticStereoSequence,
)

# small frames so the CPU test stays fast; bench.py uses KITTI-size frames
RIG = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                height=192, width=320)


@pytest.fixture(scope="module")
def sequence():
    return SyntheticStereoSequence(n_frames=12, rig=RIG, seed=4)


def test_renderer_stereo_consistency(sequence):
    """Disparity of the rendered pair must match the analytic depth of the
    ground plane: d = fu * B / Z."""
    left, right = sequence.frame(0)
    assert left.shape == (192, 320)
    # probe a ground-plane pixel: y below the horizon
    v, u = 170, 160
    # ray through pixel: Z where y-down ray hits ground at y=1.7
    dir_y = (v - RIG.cv) / RIG.fv
    z = 1.7 / dir_y
    d_expect = RIG.fu * RIG.baseline / z
    # brute-force disparity search on that row
    patch_l = left[v - 3 : v + 4, u - 3 : u + 4]
    best, best_err = 0, np.inf
    for d in range(0, 60):
        patch_r = right[v - 3 : v + 4, u - d - 3 : u - d + 4]
        err = np.abs(patch_l - patch_r).mean()
        if err < best_err:
            best, best_err = d, err
    assert abs(best - d_expect) <= 1.5


def test_trajectory_ate(sequence):
    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=256)
    pipe = OdometryPipeline(cfg, seed=1)
    traj = pipe.run(sequence.frame(i) for i in range(sequence.n_frames))
    assert traj.shape == (sequence.n_frames, 4, 4)

    gt = sequence.gt_positions()
    est = traj[:, :3, 3]
    total_dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    ate = metrics.ate_rmse(est, gt)
    # < 2% of trajectory length on noise-free synthetic data
    assert ate < 0.02 * total_dist, f"ATE {ate:.3f} m over {total_dist:.1f} m"


def test_failure_keeps_last_pose():
    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=128)
    pipe = OdometryPipeline(cfg, seed=0)
    flat = np.full((192, 320), 128.0, np.float32)  # untrackable frames
    pipe.process_pair(flat, flat)
    rec = pipe.process_pair(flat, flat)
    assert rec["success"] is False
    np.testing.assert_array_equal(pipe.trajectory[-1], np.eye(4))


def test_metrics_functions():
    gt = np.cumsum(np.random.default_rng(0).normal(size=(20, 3)), axis=0)
    # rotated + translated copy must align to ~0 ATE
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    est = gt @ R.T + np.array([5.0, -3.0, 2.0])
    assert metrics.ate_rmse(est, gt) < 1e-9
    assert metrics.ate_rmse(est, gt, align=False) > 1.0

    poses = np.tile(np.eye(4), (10, 1, 1))
    poses_gt = poses.copy()
    poses[:, 0, 3] = np.arange(10) * 1.1
    poses_gt[:, 0, 3] = np.arange(10) * 1.0
    t_err, r_err = metrics.rpe(poses, poses_gt)
    np.testing.assert_allclose(t_err, 0.1, atol=1e-9)
    np.testing.assert_allclose(r_err, 0.0, atol=1e-9)


def test_corrupted_world_stresses_ransac():
    """The corrupted world (photometric gain/bias/noise + moving objects +
    occluder; VERDICT r2 missing #5) must actually exercise the robust
    machinery: outliers get REJECTED (inlier ratio drops vs the clean world)
    while the pose estimate survives (ATE stays bounded)."""
    from uasl_motion_estimation_tpu.utils.metrics import MetricsLogger

    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=256)

    def run(corruption):
        seq = SyntheticStereoSequence(
            n_frames=10, rig=RIG, seed=4, corruption=corruption
        )
        log = MetricsLogger()
        pipe = OdometryPipeline(cfg, seed=1, logger=log)
        traj = pipe.run(seq.frame(i) for i in range(seq.n_frames))
        recs = [r for r in log.records if "n_inliers" in r and r["n_matches"] > 0]
        ratio = np.mean([r["n_inliers"] / r["n_matches"] for r in recs])
        ate = metrics.ate_rmse(traj[:, :3, 3], seq.gt_positions())
        return ratio, ate, np.mean([r["success"] for r in recs])

    clean_ratio, clean_ate, _ = run(None)
    cor_ratio, cor_ate, cor_success = run(CorruptionConfig())

    # corruption creates real outlier populations for RANSAC to reject ...
    assert cor_ratio < clean_ratio - 0.02, (cor_ratio, clean_ratio)
    # ... and the robust solve still recovers the motion
    assert cor_success == 1.0
    gt = SyntheticStereoSequence(n_frames=10, rig=RIG, seed=4).gt_positions()
    dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert cor_ate < 0.05 * dist, f"ATE {cor_ate:.3f} m over {dist:.1f} m"


def test_run_streaming_overlapped(sequence):
    """Streaming mode: generator input, chunked async uploads overlapping
    the chunk scans, tail not a multiple of chunk — same trajectory quality
    as the device-resident mode."""
    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=256)
    pipe = OdometryPipeline(cfg, seed=1)
    # 12 frames = 11 steps with chunk 4: two full chunks + a 3-step tail
    traj = pipe.run_streaming(
        (sequence.frame(i) for i in range(sequence.n_frames)), chunk=4
    )
    assert traj.shape == (sequence.n_frames, 4, 4)
    gt = sequence.gt_positions()
    dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    ate = metrics.ate_rmse(traj[:, :3, 3], gt)
    assert ate < 0.02 * dist, f"ATE {ate:.3f} m over {dist:.1f} m"


def test_run_sequence_single_dispatch(sequence):
    """Single-dispatch mode must produce the same trajectory quality as the
    streaming loop (identical solves, chained on device)."""
    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=256)
    frames = [sequence.frame(i) for i in range(sequence.n_frames)]
    pipe = OdometryPipeline(cfg, seed=1)
    traj = pipe.run_sequence(frames, chunk=4)
    assert traj.shape == (sequence.n_frames, 4, 4)
    gt = sequence.gt_positions()
    dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    ate = metrics.ate_rmse(traj[:, :3, 3], gt)
    assert ate < 0.02 * dist, f"ATE {ate:.3f} m over {dist:.1f} m"


def test_streaming_matches_staged(sequence):
    """Streaming and staged engines must agree motion-for-motion: RANSAC
    keys derive from global step indices (fold_in), so both solve identical
    per-step problems; only chunk-grouping (and therefore XLA fusion
    context) differs, which bounds any residual difference to float noise
    (VERDICT r3 item 7)."""
    cfg = default_config(
        geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv), RIG.baseline
    )._replace(max_features=256)
    frames = [sequence.frame(i) for i in range(sequence.n_frames)]

    pipe_a = OdometryPipeline(cfg, seed=1)
    ls, rs = pipe_a.stage_frames(frames)
    traj_staged = pipe_a.run_staged(ls, rs, chunk=4)

    pipe_b = OdometryPipeline(cfg, seed=1)
    traj_stream = pipe_b.run_streaming(iter(frames), chunk=4)

    dev = np.max(np.abs(traj_staged - traj_stream))
    assert dev < 1e-4, f"streaming vs staged pose deviation {dev}"

    # and repeated runs of the same engine are bit-identical (keys are a
    # pure function of (seed, step index))
    pipe_a.reset()
    traj_again = pipe_a.run_staged(ls, rs, chunk=4)
    assert np.array_equal(traj_staged, traj_again)
