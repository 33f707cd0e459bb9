"""End-to-end stereo odometry pipeline: frames in, trajectory out.

The consumer frame-loop the reference implies but does not ship
(SURVEY.md section 3.5): detect/match/track (models/frontend.py, new scope) ->
stereo VO (models/stereo_vo.py) -> pose-chain accumulation
(poseMultiplicationWithCovariance semantics, feature_types.cpp:172-193).

The per-frame compute is one jit-compiled function with static shapes
(images, feature budget), so a whole sequence runs with a single compilation;
the host loop only accumulates 4x4 pose chains and metrics.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..utils.metrics import MetricsLogger
from . import frontend as fe
from .stereo_vo import StereoVOParams, StereoVOResult, stereo_vo_solve


class PipelineConfig(NamedTuple):
    vo: StereoVOParams
    max_features: int = 500  # TrackingInfo.nb_feats default (file_IO.h:69-73)
    matcher: fe.MatcherConfig = fe.MatcherConfig()
    klt: fe.KLTConfig = fe.KLTConfig()
    detect_nms_radius: int = 5
    # Quality gate relative to the strongest corner. 1e-4 keeps weak-texture
    # grid cells (the ZNCC min_score, KLT min-eig and residual checks cull
    # genuinely untrackable ones downstream); the OpenCV-default 0.01 starves
    # the bucketed detector to ~160/500 matches on low-contrast scenes.
    detect_quality: float = 1e-4
    detector: str = "grid"  # "grid" bucketed GFTT | "topk" global top-k


class FrameOutput(NamedTuple):
    motion: jax.Array  # (4,4) prev-cam -> cur-cam
    state: jax.Array  # (6,)
    success: jax.Array
    n_matches: jax.Array
    n_inliers: jax.Array
    mean_reproj_error: jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def vo_step(
    prev_left: jax.Array,
    prev_right: jax.Array,
    cur_left: jax.Array,
    cur_right: jax.Array,
    key: jax.Array,
    cfg: PipelineConfig,
) -> FrameOutput:
    """One full frame of odometry: front-end + pose solve. Jit-compiled once
    per (image shape, config).

    Images may arrive as uint8 (the wire/staging format — 4x fewer bytes over
    the host->device link than float32); compute is always float32.
    """
    prev_left, prev_right, cur_left, cur_right = (
        x.astype(jnp.float32) for x in (prev_left, prev_right, cur_left, cur_right)
    )
    qm = fe.quad_match_frames(
        prev_left,
        prev_right,
        cur_left,
        cur_right,
        max_features=cfg.max_features,
        matcher=cfg.matcher,
        klt=cfg.klt,
        detect_kwargs=(
            ("nms_radius", cfg.detect_nms_radius),
            ("quality_level", cfg.detect_quality),
        ),
        detector=cfg.detector,
    )
    res: StereoVOResult = stereo_vo_solve(qm.uv, qm.valid, key, cfg.vo)
    return FrameOutput(
        motion=res.motion,
        state=res.state,
        success=res.success,
        n_matches=jnp.sum(qm.valid),
        n_inliers=res.n_inliers,
        mean_reproj_error=res.mean_reproj_error,
    )


def _vo_step_shared(
    prev_left: jax.Array,
    prev_right: jax.Array,
    cur_left: jax.Array,
    cur_right: jax.Array,
    pyr_prev: tuple[jax.Array, ...],
    pyr_cur: tuple[jax.Array, ...],
    key: jax.Array,
    cfg: PipelineConfig,
) -> FrameOutput:
    """vo_step over pre-converted f32 images and prebuilt left pyramids.

    The sequence scan builds each frame's artifacts ONCE (uint8->f32 convert,
    KLT pyramid) and feeds them to both steps that touch the frame; inside
    the vmapped step XLA cannot CSE those duplicate builds across lanes."""
    qm = fe.quad_match_frames(
        prev_left,
        prev_right,
        cur_left,
        cur_right,
        max_features=cfg.max_features,
        matcher=cfg.matcher,
        klt=cfg.klt,
        detect_kwargs=(
            ("nms_radius", cfg.detect_nms_radius),
            ("quality_level", cfg.detect_quality),
        ),
        detector=cfg.detector,
        pyr_prev_left=pyr_prev,
        pyr_cur_left=pyr_cur,
    )
    res: StereoVOResult = stereo_vo_solve(qm.uv, qm.valid, key, cfg.vo)
    return FrameOutput(
        motion=res.motion,
        state=res.state,
        success=res.success,
        n_matches=jnp.sum(qm.valid),
        n_inliers=res.n_inliers,
        mean_reproj_error=res.mean_reproj_error,
    )


@partial(jax.jit, static_argnames=("cfg",))
def vo_sequence_step(
    prev_left: jax.Array,
    prev_right: jax.Array,
    cur_left: jax.Array,
    cur_right: jax.Array,
    keys: jax.Array,
    cfg: PipelineConfig,
) -> tuple[jax.Array, FrameOutput]:
    """Batched sequence processing: B frame pairs -> B chained poses in ONE
    dispatch.

    The per-frame problems are independent (they couple only through the pose
    chain), so the whole batch runs as a vmap and the sequential recurrence
    pose_i = pose_{i-1} @ inv(motion_i) becomes a parallel associative scan —
    no host round-trip per frame (dispatch latency amortizes over B frames,
    and on a mesh the same code shards over segments; parallel/segments.py).
    """
    from ..parallel.segments import chain_motions

    out = jax.vmap(lambda a, b, c, d, k: vo_step(a, b, c, d, k, cfg))(
        prev_left, prev_right, cur_left, cur_right, keys
    )
    eye = jnp.eye(4, dtype=out.motion.dtype)
    motion = jnp.where(out.success[:, None, None], out.motion, eye)
    poses = chain_motions(motion)  # (B, 4, 4) cam-to-world rel. to frame 0
    return poses, out


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def vo_sequence_scan(
    prev_left: jax.Array,
    prev_right: jax.Array,
    cur_left: jax.Array,
    cur_right: jax.Array,
    keys: jax.Array,
    cfg: PipelineConfig,
    chunk: int = 8,
) -> tuple[jax.Array, FrameOutput]:
    """Whole sequence in ONE dispatch: `lax.map` over chunk groups, vmap
    within a chunk.

    Peak memory stays at `chunk` frames of front-end intermediates while the
    host pays a single dispatch/transfer round-trip for the entire sequence
    (B must be a multiple of chunk; pad with repeated frames if needed).
    """
    from ..parallel.segments import chain_motions

    b = prev_left.shape[0]
    assert b % chunk == 0, f"pad batch {b} to a multiple of chunk {chunk}"
    g = b // chunk

    def one_chunk(args):
        pl_, pr_, cl_, cr_, ks = args
        return jax.vmap(lambda a, b_, c, d, k: vo_step(a, b_, c, d, k, cfg))(
            pl_, pr_, cl_, cr_, ks
        )

    grouped = tuple(
        x.reshape((g, chunk) + x.shape[1:])
        for x in (prev_left, prev_right, cur_left, cur_right, keys)
    )
    out = jax.lax.map(one_chunk, grouped)
    out = jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), out)
    eye = jnp.eye(4, dtype=out.motion.dtype)
    motion = jnp.where(out.success[:, None, None], out.motion, eye)
    return chain_motions(motion), out


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def vo_sequence_scan_shared(
    ls: jax.Array,
    rs: jax.Array,
    keys: jax.Array,
    cfg: PipelineConfig,
    chunk: int = 8,
) -> FrameOutput:
    """Whole staged sequence in ONE dispatch with per-frame artifact sharing.

    Takes the full frame stacks (n, H, W) — uint8 wire format or f32 — and
    derives the n-1 steps internally: each frame's f32 conversion and KLT
    pyramid are computed ONCE (vmap over frames), then both adjacent steps
    consume them. In vo_sequence_scan each step recomputed them for its own
    prev AND cur frame (2x per frame; vmap lanes see different operands, so
    XLA cannot CSE the duplicates). keys must have g*chunk entries for the
    padded step count (see run_staged)."""
    from ..ops import image as im

    n = int(ls.shape[0])
    b = n - 1
    gc = int(keys.shape[0])
    assert gc % chunk == 0 and gc >= b
    g = gc // chunk

    lf = ls.astype(jnp.float32)
    rf = rs.astype(jnp.float32)
    pyr = jax.vmap(lambda x: tuple(im.build_pyramid(x, cfg.klt.n_levels)))(lf)

    idx_prev = np.clip(np.arange(gc), 0, b - 1)
    idx_cur = idx_prev + 1
    args = (
        lf[idx_prev], rf[idx_prev], lf[idx_cur], rf[idx_cur],
        tuple(p[idx_prev] for p in pyr), tuple(p[idx_cur] for p in pyr),
        keys,
    )
    grouped = jax.tree.map(
        lambda x: x.reshape((g, chunk) + x.shape[1:]), args
    )

    def one_chunk(a):
        pl_, pr_, cl_, cr_, pp_, pc_, ks = a
        return jax.vmap(
            lambda p1, p2, c1, c2, pp, pc, k: _vo_step_shared(
                p1, p2, c1, c2, pp, pc, k, cfg
            )
        )(pl_, pr_, cl_, cr_, pp_, pc_, ks)

    out = jax.lax.map(one_chunk, grouped)
    return jax.tree.map(lambda x: x.reshape((gc,) + x.shape[2:]), out)


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def _vo_scan_packed(ls, rs, keys, cfg, chunk):
    """vo_sequence_scan_shared with the per-frame outputs PACKED into one
    (B, 20) f32 array: [motion 16, success, n_matches, n_inliers,
    mean_reproj_error].

    One array -> one host fetch: each extra transfer through the tunnel/PCIe
    costs fixed latency, and run_staged only needs these fields (the pose
    chain is re-composed on the host in float64 anyway, so the device-side
    chain is dead code XLA eliminates)."""
    out = vo_sequence_scan_shared(ls, rs, keys, cfg, chunk)
    f32 = out.motion.dtype
    b = out.motion.shape[0]
    return jnp.concatenate(
        [
            out.motion.reshape(b, 16),
            out.success[:, None].astype(f32),
            out.n_matches[:, None].astype(f32),
            out.n_inliers[:, None].astype(f32),
            out.mean_reproj_error[:, None].astype(f32),
        ],
        axis=1,
    )


class OdometryPipeline:
    """Host-side frame loop with the reference's degraded-frame contract:
    a failed frame keeps the last pose and is skipped (SURVEY.md section 5,
    failure detection)."""

    def __init__(self, cfg: PipelineConfig, seed: int = 0,
                 logger: MetricsLogger | None = None):
        self.cfg = cfg
        self.key = jax.random.key(seed)
        self.logger = logger
        self.reset()

    def reset(self):
        self.pose = np.eye(4)  # cam-to-world of current frame
        self.trajectory = [self.pose.copy()]
        self.prev_pair: tuple | None = None
        self.frame_idx = 0

    def process_pair(self, left: np.ndarray, right: np.ndarray) -> dict:
        """Feed one stereo pair; returns the per-frame metrics record."""
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        rec: dict = {"frame": self.frame_idx}
        if self.prev_pair is not None:
            self.key, sub = jax.random.split(self.key)
            out = vo_step(*self.prev_pair, left, right, sub, self.cfg)
            # ONE device_get for the whole pytree: the tunnel/PCIe round-trip
            # per transfer dominates per-frame latency, not the bytes
            host = jax.device_get(out)
            success = bool(host.success)
            if success:
                # pose_cur = pose_prev * motion^-1 (motion maps prev->cur pts)
                self.pose = self.pose @ np.linalg.inv(
                    np.asarray(host.motion, np.float64)
                )
            rec.update(
                success=success,
                n_matches=int(host.n_matches),
                n_inliers=int(host.n_inliers),
                mean_reproj_error=float(host.mean_reproj_error),
            )
            self.trajectory.append(self.pose.copy())
        self.prev_pair = (left, right)
        self.frame_idx += 1
        if self.logger is not None:
            self.logger.log(**rec)
        return rec

    def run(self, frames: Iterable[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
        """Process a whole sequence; returns (N, 4, 4) cam-to-world poses."""
        for left, right in frames:
            self.process_pair(left, right)
        return np.asarray(self.trajectory)

    def stage_frames(
        self, frames: list[tuple[np.ndarray, np.ndarray]]
    ) -> tuple[jax.Array, jax.Array]:
        """Upload a frame sequence to device HBM as uint8 (4x fewer bytes on
        the host->device link than float32; conversion happens on device
        inside the jitted step). Returns (lefts, rights) device arrays —
        feed to run_staged.
        """
        ls = np.stack([np.asarray(f[0]) for f in frames])
        rs = np.stack([np.asarray(f[1]) for f in frames])
        ls = jax.device_put(np.clip(ls, 0, 255).astype(np.uint8))
        rs = jax.device_put(np.clip(rs, 0, 255).astype(np.uint8))
        # materialize the transfer before returning (async device_put)
        jax.device_get((ls[0, :1, :1], rs[0, :1, :1]))
        return ls, rs

    def run_staged(
        self, ls: jax.Array, rs: jax.Array, chunk: int = 8
    ) -> np.ndarray:
        """Whole-sequence single-dispatch over device-resident frames.

        The pose chain is composed on the host in float64 (40+ chained f32
        4x4 inversions measurably drift; the per-frame motions themselves
        stay device-computed). Returns (N, 4, 4) cam-to-world poses.
        """
        n = int(ls.shape[0])
        b = n - 1
        g = -(-b // chunk)
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, g * chunk)
        packed = np.asarray(
            _vo_scan_packed(ls, rs, keys, self.cfg, chunk)
        )  # ONE transfer: (B, 20) [motion 16, success, n_matches, n_inl, err]
        pose = self.pose.copy()
        for i in range(b):
            success = bool(packed[i, 16] > 0.5)
            if success:
                pose = pose @ np.linalg.inv(
                    packed[i, :16].reshape(4, 4).astype(np.float64)
                )
            self.trajectory.append(pose.copy())
            if self.logger is not None:
                self.logger.log(
                    frame=self.frame_idx + i + 1,
                    success=success,
                    n_matches=int(packed[i, 17]),
                    n_inliers=int(packed[i, 18]),
                    mean_reproj_error=float(packed[i, 19]),
                )
        self.pose = pose
        self.frame_idx += n
        return np.asarray(self.trajectory)

    def run_sequence(
        self,
        frames: list[tuple[np.ndarray, np.ndarray]],
        chunk: int = 8,
    ) -> np.ndarray:
        """Whole-sequence single-dispatch mode (fastest; see
        vo_sequence_scan). Returns (N, 4, 4) cam-to-world poses."""
        n = len(frames)
        b = n - 1
        g = -(-b // chunk)  # ceil
        pad = g * chunk - b
        idx_prev = np.clip(np.arange(g * chunk), 0, b - 1)
        idx_cur = idx_prev + 1
        ls = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
        rs = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, g * chunk)
        poses, out = vo_sequence_scan(
            ls[idx_prev], rs[idx_prev], ls[idx_cur], rs[idx_cur], keys,
            self.cfg, chunk,
        )
        del pad
        poses = np.asarray(poses[:b], np.float64)
        base = self.pose.copy()
        for i in range(b):
            self.trajectory.append(base @ poses[i])
        self.pose = base @ poses[b - 1]
        self.frame_idx += n
        if self.logger is not None:
            host = jax.device_get(out)
            for i in range(b):
                self.logger.log(
                    frame=i + 1,
                    success=bool(host.success[i]),
                    n_matches=int(host.n_matches[i]),
                    n_inliers=int(host.n_inliers[i]),
                    mean_reproj_error=float(host.mean_reproj_error[i]),
                )
        return np.asarray(self.trajectory)

    def run_batched(
        self,
        frames: list[tuple[np.ndarray, np.ndarray]],
        chunk: int = 16,
    ) -> np.ndarray:
        """Device-resident batch processing: ``chunk`` frame pairs per
        dispatch (throughput mode; `run` is the streaming/latency mode).

        Returns (N, 4, 4) cam-to-world poses.
        """
        n = len(frames)
        ls = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
        rs = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
        base = self.pose.copy()
        for start in range(0, n - 1, chunk):
            stop = min(start + chunk, n - 1)
            b = stop - start
            # pad the last chunk to the static chunk size (single compile)
            idx = jnp.clip(jnp.arange(chunk) + start, 0, n - 2)
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, chunk)
            poses, out = vo_sequence_step(
                ls[idx], rs[idx], ls[idx + 1], rs[idx + 1], keys, self.cfg
            )
            poses = np.asarray(poses[:b], np.float64)
            for i in range(b):
                self.trajectory.append(base @ poses[i])
            base = base @ poses[b - 1]
            if self.logger is not None:
                host = jax.device_get(out)
                for i in range(b):
                    self.logger.log(
                        frame=self.frame_idx + start + i + 1,
                        success=bool(host.success[i]),
                        n_matches=int(host.n_matches[i]),
                        n_inliers=int(host.n_inliers[i]),
                        mean_reproj_error=float(host.mean_reproj_error[i]),
                    )
        self.pose = base
        self.frame_idx += n
        return np.asarray(self.trajectory)


def default_config(
    intr: geo.Intrinsics,
    baseline: float,
    image_shape: tuple[int, int] | None = None,
    **vo_overrides,
) -> PipelineConfig:
    """Reference-default pipeline config.

    ``image_shape`` (h, w) scales resolution-dependent constants: the RANSAC
    sample spread gate is the reference's 1000 px^2 AT KITTI RESOLUTION
    (StereoVisualOdometry.cpp:63) — applied verbatim to a small frame it
    rejects nearly every sample (round 1's multichip dryrun failed 5/8
    frames this way), so it scales with image area.
    """
    if image_shape is not None and "min_spread_area" not in vo_overrides:
        h, w = image_shape
        vo_overrides["min_spread_area"] = 1000.0 * (h * w) / (376.0 * 1241.0)
    vo = StereoVOParams(intr1=intr, intr2=intr, baseline=baseline, **vo_overrides)
    return PipelineConfig(vo=vo)
