"""Full stereo odometry system: persistent tracks + per-frame VO + windowed BA.

This is the complete consumer loop the reference implies but does not ship
(SURVEY.md section 3.5): maintain WBA-style tracks across frames, estimate
per-frame egomotion from quad matches, and every ``ba_rate`` frames refine the
sliding window with bundle adjustment (the reference consumer's
``BundleAdjuster`` cadence, file_IO.h:69-73 ba_rate/window_size config).

Device-side: one jit-compiled ``track_and_solve`` step per frame (front-end +
table update + VO) and one jitted BA solve per window — all fixed shapes.
Host-side: pose-chain bookkeeping and BA scheduling.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops import image as im
from ..ops import lie
from ..solvers.ba import BAConfig, BAProblem, ba_solve, gate_tracks
from ..utils.metrics import MetricsLogger
from . import frontend as fe
from . import tracks as tr
from .stereo_vo import StereoVOParams, stereo_vo_solve


class OdometryConfig(NamedTuple):
    vo: StereoVOParams
    max_tracks: int = 500  # TrackingInfo.nb_feats (file_IO.h:69)
    window: int = 5  # TrackingInfo.window_size default
    ba_rate: int = 5  # run BA every ba_rate frames (file_IO.h:71)
    n_fixed: int = 2  # fixed frames in BA (VisualOdometry.h:25)
    matcher: fe.MatcherConfig = fe.MatcherConfig()
    klt: fe.KLTConfig = fe.KLTConfig()
    detect_nms_radius: int = 5
    # Detection defaults unified with PipelineConfig (VERDICT r4 weak #2):
    # the round-4 pipeline lesson was that quality 0.01 starves detection
    # to ~160/500 matches on low-contrast scenes; grid bucketing + 1e-4
    # keeps the budget full with enforced spatial spread.
    detect_quality: float = 1e-4
    detector: str = "grid"  # "grid" (bucketed best-per-cell) or "topk"
    # Parallax keyframe gate (TrackingInfo.parallax, file_IO.h:73 — the
    # reference exposes parallax as a first-class tracking knob; this is
    # its consumer semantic): when the median tracked displacement since
    # the last KEYFRAME is below this many pixels, the frame is
    # near-stationary — the pose still updates (VO solves keyframe ->
    # current), but the track table, keyframe image, and BA window do NOT
    # advance, deferring triangulation/BA until parallax suffices. Exactly
    # the near-stop/pure-rotation regime where per-frame triangulation is
    # noise-dominated. 0 disables (every frame is a keyframe — the
    # pre-round-5 behavior).
    parallax: float = 0.0
    min_track_sep: float = 8.0  # new detections must be this far from tracks
    epipolar_tol: float = 1.5  # |v_l - v_r| rectified consistency
    ba_min_obs: int = 2
    # pre-BA inlier gate vs the VO-chained init (solvers.ba.gate_tracks):
    # coherent wrong-motion tracks (moving objects) must not reach BA
    track_gate_px: float = 3.0


class StepOutput(NamedTuple):
    table: tr.TrackTable
    motion: jax.Array  # (4, 4)
    success: jax.Array
    n_matches: jax.Array
    n_inliers: jax.Array
    mean_reproj_error: jax.Array
    n_tracks: jax.Array
    median_flow: jax.Array  # median |displacement| of surviving tracks (px)


@partial(jax.jit, static_argnames=("cfg",))
def track_and_solve(
    table: tr.TrackTable,
    prev_left: jax.Array,
    cur_left: jax.Array,
    cur_right: jax.Array,
    key: jax.Array,
    cfg: OdometryConfig,
) -> StepOutput:
    """One frame: KLT-extend tracks, stereo-match, replenish, solve VO."""
    m = cfg.max_tracks

    prev_uv, prev_ok = tr.latest_uv(table)  # (M, 4), (M,)

    # 1. temporal KLT on the left camera
    tracked = fe.klt_track(prev_left, cur_left, prev_uv[:, :2], prev_ok, cfg.klt)

    # 2. stereo match at the tracked locations
    f_right, _, stereo_ok = fe.match_stereo(
        cur_left, cur_right, tracked.pts, tracked.valid, cfg.matcher
    )
    epi_ok = jnp.abs(f_right[:, 1] - tracked.pts[:, 1]) <= cfg.epipolar_tol
    tracked_uv = jnp.concatenate([tracked.pts, f_right], axis=-1)  # (M, 4)
    tracked_ok = tracked.valid & stereo_ok & epi_ok

    # 3. fresh detections away from surviving tracks
    if cfg.detector == "grid":
        det_xy, _, det_ok = im.detect_features_grid(
            cur_left, max_features=m, quality_level=cfg.detect_quality
        )
    else:
        det_xy, _, det_ok = im.detect_features(
            cur_left,
            max_features=m,
            quality_level=cfg.detect_quality,
            nms_radius=cfg.detect_nms_radius,
        )
    d2 = jnp.sum(
        (det_xy[:, None, :] - tracked.pts[None, :, :]) ** 2, axis=-1
    )  # (K, M)
    d2 = jnp.where(tracked_ok[None, :], d2, jnp.inf)
    far = jnp.min(d2, axis=1) > cfg.min_track_sep**2
    new_right, _, new_stereo_ok = fe.match_stereo(
        cur_left, cur_right, det_xy, det_ok & far, cfg.matcher
    )
    new_uv = jnp.concatenate([det_xy, new_right], axis=-1)
    new_ok = det_ok & far & new_stereo_ok

    # 4. advance the table
    new_table = tr.advance(table, tracked_uv, tracked_ok, new_uv, new_ok)

    # 5. per-frame VO from the (t-1, t) quad matches of surviving tracks
    quad = jnp.stack(
        [
            prev_uv[:, 0:2],  # f1 prev left
            prev_uv[:, 2:4],  # f2 prev right
            tracked_uv[:, 0:2],  # f3 cur left
            tracked_uv[:, 2:4],  # f4 cur right
        ],
        axis=1,
    )  # (M, 4, 2)
    quad_valid = prev_ok & tracked_ok
    res = stereo_vo_solve(quad, quad_valid, key, cfg.vo)

    flow = jnp.linalg.norm(tracked.pts - prev_uv[:, :2], axis=-1)
    median_flow = jnp.nanmedian(jnp.where(quad_valid, flow, jnp.nan))

    return StepOutput(
        table=new_table,
        motion=res.motion,
        success=res.success,
        n_matches=jnp.sum(quad_valid),
        n_inliers=res.n_inliers,
        mean_reproj_error=res.mean_reproj_error,
        n_tracks=jnp.sum(new_table.active),
        median_flow=median_flow,
    )


@partial(jax.jit, static_argnames=("cfg",))
def bootstrap_frame(
    cur_left: jax.Array, cur_right: jax.Array, cfg: OdometryConfig
) -> tr.TrackTable:
    """Fill an empty table from the first stereo pair."""
    table = tr.empty_table(cfg.max_tracks, cfg.window)
    if cfg.detector == "grid":
        det_xy, _, det_ok = im.detect_features_grid(
            cur_left, max_features=cfg.max_tracks,
            quality_level=cfg.detect_quality
        )
    else:
        det_xy, _, det_ok = im.detect_features(
            cur_left,
            max_features=cfg.max_tracks,
            quality_level=cfg.detect_quality,
            nms_radius=cfg.detect_nms_radius,
        )
    f_right, _, stereo_ok = fe.match_stereo(
        cur_left, cur_right, det_xy, det_ok, cfg.matcher
    )
    new_uv = jnp.concatenate([det_xy, f_right], axis=-1)
    return tr.advance(
        table,
        jnp.zeros((cfg.max_tracks, 4), cur_left.dtype),
        jnp.zeros(cfg.max_tracks, bool),
        new_uv,
        det_ok & stereo_ok,
    )


@partial(jax.jit, static_argnames=("cfg",))
def ba_refine_window(
    table: tr.TrackTable,
    window_cams: jax.Array,
    cfg: OdometryConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Windowed BA over the current table (BundleAdjuster semantics,
    BundleAdjuster.h:432-476).

    Args:
      window_cams: (W, 6) [angle-axis, translation] world->cam for the window
        frames, oldest first, in the BA gauge (world = window frame 0).

    Returns (refined (W, 6) cams, points (M, 3), final cost).
    """
    obs, mask = tr.ba_window_view(table, min_obs=cfg.ba_min_obs)

    # initialize points by triangulating each track's newest observation from
    # the corresponding window camera
    newest_slot = jnp.argmax(
        jnp.where(table.obs_mask,
                  jnp.arange(table.window)[None, :], -1), axis=1
    )  # (M,)
    uv_new = jnp.take_along_axis(
        table.uv, newest_slot[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0, :]
    p = cfg.vo
    pts_cam = geo.triangulate_disparity(
        uv_new[:, 0:2], uv_new[:, 2:4], p.intr1, p.intr2, p.baseline
    )  # (M, 3) in that frame's camera
    cam_of_track = window_cams[newest_slot]  # (M, 6)
    R = jax.vmap(lambda c: lie.so3_exp(c[:3]))(cam_of_track)
    pts_world = jnp.einsum(
        "mij,mj->mi", jnp.swapaxes(R, -1, -2), pts_cam - cam_of_track[:, 3:6]
    )

    ba_cfg = BAConfig(
        intr=p.intr1,
        baseline=float(p.baseline),
        n_fixed=cfg.n_fixed,
    )
    keep = gate_tracks(window_cams, pts_world, obs, mask, ba_cfg,
                       cfg.track_gate_px)
    mask = mask & keep[None, :]
    result = ba_solve(
        BAProblem(cam=window_cams, pts=pts_world, obs=obs, mask=mask), ba_cfg
    )
    return result.cam, result.pts, result.cost


def cam6_from_pose(T_w2c: np.ndarray) -> np.ndarray:
    """4x4 world->cam matrix -> [angle-axis, translation] 6-vector."""
    aa = np.asarray(lie.so3_log(jnp.asarray(T_w2c[:3, :3], jnp.float32)))
    return np.concatenate([aa, T_w2c[:3, 3]]).astype(np.float32)


def pose_from_cam6(cam6: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(cam6[:3], jnp.float32)))
    T[:3, 3] = cam6[3:6]
    return T


class OdometrySystem:
    """Host frame loop with track persistence and BA refinement."""

    def __init__(self, cfg: OdometryConfig, seed: int = 0,
                 logger: MetricsLogger | None = None, use_ba: bool = True):
        self.cfg = cfg
        self.key = jax.random.key(seed)
        self.logger = logger
        self.use_ba = use_ba
        self.reset()

    def reset(self):
        self.pose = np.eye(4)  # cam-to-world of current frame
        self.trajectory = [self.pose.copy()]
        self.table: tr.TrackTable | None = None
        self.kf_left = None  # last KEYFRAME's left image (tracking anchor)
        self.kf_pose = np.eye(4)  # cam-to-world of the keyframe
        self.frame_idx = 0
        self.n_keyframes = 0
        self.window_poses: list[np.ndarray] = []  # cam-to-world per window frame
        self.window_traj_idx: list[int] = []  # trajectory index per window frame

    def process_pair(self, left, right) -> dict:
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        rec: dict = {"frame": self.frame_idx}
        if self.table is None:
            self.table = bootstrap_frame(left, right, self.cfg)
            self.window_poses = [self.pose.copy()]
            self.window_traj_idx = [0]
            self.kf_left = left
            self.kf_pose = self.pose.copy()
            self.n_keyframes = 1
            rec["n_tracks"] = int(jnp.sum(self.table.active))
        else:
            self.key, sub = jax.random.split(self.key)
            # tracks anchor on the last KEYFRAME (== previous frame unless
            # the parallax gate held it): VO solves keyframe -> current
            out = track_and_solve(
                self.table, self.kf_left, left, right, sub, self.cfg
            )
            success = bool(out.success)
            if success:
                self.pose = self.kf_pose @ np.linalg.inv(
                    np.asarray(out.motion, np.float64)
                )
            self.trajectory.append(self.pose.copy())
            flow = float(out.median_flow)
            # parallax keyframe gate (see OdometryConfig.parallax): hold
            # the keyframe while the scene has not moved enough; a FAILED
            # frame always advances (stale anchors must not persist
            # through tracking loss)
            advance = (
                self.cfg.parallax <= 0.0
                or not np.isfinite(flow)
                or flow >= self.cfg.parallax
                or not success
            )
            rec.update(
                success=success,
                n_matches=int(out.n_matches),
                n_inliers=int(out.n_inliers),
                n_tracks=int(out.n_tracks),
                mean_reproj_error=float(out.mean_reproj_error),
                median_flow_px=round(flow, 2),
                keyframe=bool(advance),
            )
            if advance:
                self.table = out.table
                self.kf_left = left
                self.kf_pose = self.pose.copy()
                self.n_keyframes += 1
                self.window_poses.append(self.pose.copy())
                self.window_traj_idx.append(len(self.trajectory) - 1)
                if len(self.window_poses) > self.cfg.window:
                    self.window_poses.pop(0)
                    self.window_traj_idx.pop(0)
                if (
                    self.use_ba
                    and self.n_keyframes % self.cfg.ba_rate == 0
                    and len(self.window_poses) == self.cfg.window
                ):
                    rec["ba_cost"] = self._run_ba()
        self.frame_idx += 1
        if self.logger is not None:
            self.logger.log(**rec)
        return rec

    def _run_ba(self) -> float:
        """Refine the window; gauge = oldest window frame."""
        base = self.window_poses[0]  # cam-to-world of window frame 0
        # BA gauge: world = window frame 0 camera; world->cam_i maps frame-0
        # coordinates into frame i, so cam_i = inv(pose_i) @ base
        cams_j = jnp.asarray(np.stack(
            [cam6_from_pose(np.linalg.inv(p) @ base) for p in self.window_poses]
        ))
        refined, pts, cost = ba_refine_window(self.table, cams_j, self.cfg)
        refined = np.asarray(refined)
        # write refined poses back at each window KEYFRAME's trajectory
        # index (with the parallax gate on, window frames are keyframes,
        # not necessarily the trajectory tail)
        n = len(self.window_poses)
        for i in range(self.cfg.n_fixed, n):
            T_w2c = pose_from_cam6(refined[i])
            cam_to_world = base @ np.linalg.inv(T_w2c)
            self.window_poses[i] = cam_to_world
            self.trajectory[self.window_traj_idx[i]] = cam_to_world
        self.pose = self.window_poses[-1].copy()
        self.kf_pose = self.pose.copy()
        return float(cost)

    def run(self, frames) -> np.ndarray:
        for left, right in frames:
            self.process_pair(left, right)
        return np.asarray(self.trajectory)
