"""Monocular odometry pipeline: detection + KLT + essential-matrix egomotion
with relative-scale propagation.

The mono analogue of models/pipeline.py — the consumer loop around
``MonoVisualOdometry`` the reference implies (SURVEY.md section 3.5):
translation from an essential matrix is only known up to scale, so each
frame's scale is propagated from the previous frame by comparing distances
between common triangulated points (findRelativeScale,
MonoVisualOdometry.cpp:76-87).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops import image as im
from ..utils.metrics import MetricsLogger
from . import frontend as fe
from .mono_vo import MonoVOParams, MonoVOResult, mono_vo_solve


class MonoPipelineConfig(NamedTuple):
    vo: MonoVOParams
    max_features: int = 500
    klt: fe.KLTConfig = fe.KLTConfig()
    detect_nms_radius: int = 5
    detect_quality: float = 0.01


class MonoFrameOutput(NamedTuple):
    result: MonoVOResult
    matches: jax.Array  # (N, 2, 2)
    valid: jax.Array  # (N,)


@partial(jax.jit, static_argnames=("cfg",))
def mono_vo_step(
    prev_img: jax.Array,
    cur_img: jax.Array,
    key: jax.Array,
    cfg: MonoPipelineConfig,
) -> MonoFrameOutput:
    """One mono frame: detect in prev, KLT to cur, solve essential+pose."""
    feats, _, v0 = im.detect_features(
        prev_img,
        max_features=cfg.max_features,
        quality_level=cfg.detect_quality,
        nms_radius=cfg.detect_nms_radius,
    )
    tracked = fe.klt_track(prev_img, cur_img, feats, v0, cfg.klt)
    matches = jnp.stack([feats, tracked.pts], axis=1)  # (N, 2, 2)
    res = mono_vo_solve(matches, tracked.valid, key, cfg.vo)
    return MonoFrameOutput(result=res, matches=matches, valid=tracked.valid)


class MonoOdometryPipeline:
    """Host frame loop: pose chain with relative-scale propagation.

    The first motion's translation is normalized to ``initial_speed`` (mono
    gauge freedom); subsequent frames inherit metric consistency through the
    relative scale of shared triangulated structure."""

    def __init__(self, cfg: MonoPipelineConfig, seed: int = 0,
                 initial_speed: float = 1.0,
                 logger: MetricsLogger | None = None):
        self.cfg = cfg
        self.key = jax.random.key(seed)
        self.initial_speed = initial_speed
        self.logger = logger
        self.reset()

    def reset(self):
        self.pose = np.eye(4)
        self.trajectory = [self.pose.copy()]
        self.prev_img = None
        self.prev_out: MonoFrameOutput | None = None
        self.speed = self.initial_speed
        self.frame_idx = 0

    def process_frame(self, img: np.ndarray) -> dict:
        img = jnp.asarray(img, jnp.float32)
        rec: dict = {"frame": self.frame_idx}
        if self.prev_img is not None:
            self.key, sub = jax.random.split(self.key)
            out = mono_vo_step(self.prev_img, img, sub, self.cfg)
            host = jax.device_get(out.result)
            success = bool(host.success)
            if success:
                if self.prev_out is not None:
                    s = self._relative_scale(out)
                    if np.isfinite(s) and 0.1 < s < 10.0:
                        self.speed *= float(s)
                R, t = np.asarray(host.R, np.float64), np.asarray(host.t, np.float64)
                motion = np.eye(4)
                motion[:3, :3] = R
                motion[:3, 3] = t * self.speed
                self.pose = self.pose @ np.linalg.inv(motion)
            rec.update(success=success, n_inliers=int(host.n_inliers))
            self.trajectory.append(self.pose.copy())
            self.prev_out = out
        self.prev_img = img
        self.frame_idx += 1
        if self.logger is not None:
            self.logger.log(**rec)
        return rec

    def _relative_scale(self, out: MonoFrameOutput) -> float:
        """Ratio of distances between common structure in consecutive
        two-view reconstructions (findRelativeScale semantics)."""
        prev = self.prev_out
        # common features: previous step's *current* frame == this step's
        # *previous* frame; match by pixel location of the shared image
        prev_pts = prev.matches[:, 1]  # (N, 2) in shared frame
        cur_pts = out.matches[:, 0]
        d2 = jnp.sum((prev_pts[:, None] - cur_pts[None, :]) ** 2, axis=-1)
        nn = jnp.argmin(d2, axis=1)
        close = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0] < 1.0
        mask = (
            close
            & prev.result.inlier_mask
            & out.result.inlier_mask[nn]
        )
        # prev structure is in the shared frame after applying prev motion
        prev_3d = prev.result.pts3d @ prev.result.R.T + prev.result.t
        cur_3d = out.result.pts3d[nn]
        s = geo.relative_scale(prev_3d, cur_3d, mask)
        return float(s)

    def run(self, frames) -> np.ndarray:
        for f in frames:
            self.process_frame(f)
        return np.asarray(self.trajectory)
