"""Full-system integration: persistent tracks + VO + windowed BA on the
synthetic sequence (SURVEY.md section 4, tier 3; BASELINE config 4)."""

import numpy as np
import pytest

from uasl_motion_estimation_tpu.models.frontend import MatcherConfig
from uasl_motion_estimation_tpu.models.odometry import (
    OdometryConfig,
    OdometrySystem,
)
from uasl_motion_estimation_tpu.models.stereo_vo import StereoVOParams
from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.utils import metrics
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

RIG = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                height=192, width=320)


def make_cfg(**over):
    intr = geo.Intrinsics(RIG.fu, RIG.fv, RIG.cu, RIG.cv)
    vo = StereoVOParams(intr1=intr, intr2=intr, baseline=RIG.baseline)
    base = dict(vo=vo, max_tracks=256, window=5, ba_rate=5,
                matcher=MatcherConfig(max_disparity=96))
    base.update(over)
    return OdometryConfig(**base)


@pytest.fixture(scope="module")
def sequence():
    seq = SyntheticStereoSequence(n_frames=14, rig=RIG, seed=4)
    return seq, [seq.frame(i) for i in range(seq.n_frames)]


def test_tracked_vo_trajectory(sequence):
    seq, frames = sequence
    sysm = OdometrySystem(make_cfg(), seed=1, use_ba=False)
    traj = sysm.run(frames)
    assert traj.shape == (seq.n_frames, 4, 4)
    gt = seq.gt_positions()
    dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    ate = metrics.ate_rmse(traj[:, :3, 3], gt)
    assert ate < 0.02 * dist, f"ATE {ate:.3f} m over {dist:.1f} m"


def test_tracks_persist_across_frames(sequence):
    _, frames = sequence
    sysm = OdometrySystem(make_cfg(), seed=1, use_ba=False)
    recs = [sysm.process_pair(*f) for f in frames[:6]]
    # steady state keeps a healthy track population and match counts
    assert all(r["n_tracks"] > 50 for r in recs[1:]), recs
    assert all(r["n_matches"] > 30 for r in recs[1:]), recs


def test_parallax_gate_holds_keyframes_near_stop():
    """TrackingInfo.parallax consumed (VERDICT r4 item 7): on a sequence
    with a near-stop stretch, the parallax gate must hold keyframes while
    the scene barely moves (fewer keyframes than frames), keep per-frame
    poses flowing, and not degrade — the near-stationary solves it skips
    are exactly the noise-dominated ones."""
    from uasl_motion_estimation_tpu.utils.synthetic import stress_trajectory

    n = 18
    seq = SyntheticStereoSequence(
        n_frames=n, rig=RIG, seed=7,
        trajectory=stress_trajectory("near_stop", n))
    frames = [seq.frame(i) for i in range(n)]
    gt = seq.gt_positions()

    ungated = OdometrySystem(make_cfg(), seed=1, use_ba=False)
    traj0 = ungated.run(frames)
    gated = OdometrySystem(make_cfg(parallax=2.0), seed=1, use_ba=False)
    traj1 = gated.run(frames)

    assert traj1.shape == traj0.shape == (n, 4, 4)
    # the stop stretch (~6 frames at 1 cm/frame) must be held
    assert gated.n_keyframes <= n - 4, gated.n_keyframes
    assert ungated.n_keyframes == n
    ate0 = metrics.ate_rmse(traj0[:, :3, 3], gt)
    ate1 = metrics.ate_rmse(traj1[:, :3, 3], gt)
    assert ate1 < max(1.2 * ate0, 0.05), (ate0, ate1)


def test_ba_refinement_improves_ate(sequence):
    """BA must EARN its keep: strictly lower ATE than the VO-only chain on
    the same frames (VERDICT r2 weak #1 — the old bound passed even when BA
    made the trajectory 50% worse)."""
    seq, frames = sequence
    no_ba = OdometrySystem(make_cfg(), seed=1, use_ba=False)
    traj0 = no_ba.run(frames)
    with_ba = OdometrySystem(make_cfg(), seed=1, use_ba=True)
    traj1 = with_ba.run(frames)
    gt = seq.gt_positions()
    ate0 = metrics.ate_rmse(traj0[:, :3, 3], gt)
    ate1 = metrics.ate_rmse(traj1[:, :3, 3], gt)
    assert ate1 < 0.95 * ate0, (ate0, ate1)
