"""Device-resident integrated system: batched VO + window-parallel BA.

The reference consumer loop couples per-frame VO with a windowed
``BundleAdjuster`` every ``ba_rate`` frames over the last ``window_size``
poses (reference: include/MotionEstimation/core/file_IO.h:67-91 TrackingInfo,
BundleAdjuster.h:432-476). Run literally, that loop is serial: each window
must wait for the VO chain to reach it, and each BA must finish before the
chain continues (models/odometry.py implements that latency-mode loop with
per-frame host round-trips).

The TPU-first re-design is a *parallel-window smoother* with the same
measurement model and cadence:

1. **Batched VO** over all frame pairs (models/pipeline.py single-dispatch
   scan) produces the motion chain — unchanged headline path.
2. **Window track building**: every BA window re-tracks its own features
   from its first frame through the window, exactly like the reference's
   WBA_Point tables would contain — but windows are INDEPENDENT, so they
   vmap: the sequential depth is window_size-1 KLT steps, not n_frames.
3. **Batched BA**: all windows solve concurrently (vmapped dense-Schur LM,
   solvers/ba.py) initialized from the VO chain; refined relative motions
   replace the VO motions in their span.

The result is the same sliding-window refinement (each motion is estimated
from every track that observes both endpoint frames within a window) with
thousands of frames of BA running as a handful of large batched dispatches.
All stages are shape-static and live in ONE jit; the host only composes the
final pose chain in float64.
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
from . import frontend as fe
from .pipeline import PipelineConfig, _vo_scan_packed


class SmootherConfig(NamedTuple):
    pipe: PipelineConfig
    window: int = 5  # TrackingInfo.window_size default (file_IO.h:69)
    # Window stride in frames (the reference's ba_rate cadence,
    # file_IO.h:70; its default 0 means "consumer-chosen"). window-1 tiles
    # every motion into exactly one window (smoother tiling); larger strides
    # leave (stride - window + 1) motions per period un-refined.
    ba_rate: int = 4
    # Fixed frames per window: 1 = pure gauge fixing (stereo BA has metric
    # scale from the baseline, so one anchor suffices); the reference's
    # sequential loop uses 2 (VisualOdometry.h:25) because its windows feed
    # forward into an already-refined chain.
    n_fixed: int = 1
    ba_min_obs: int = 2
    ba_max_iter: int = 25
    huber_delta: float = 1.0  # HuberLoss(1.0), BundleAdjuster.h:447
    # Pre-BA track gate: drop tracks whose worst reprojection residual
    # against the VO-initialized cameras exceeds this (px). The window-level
    # analogue of the reference's RANSAC inlier gate (computeInliers,
    # StereoVisualOdometry.cpp:94-114): tracks on independently moving
    # objects are CONSISTENT with a wrong motion, so Huber down-weighting
    # alone lets them drag the window (measured: BA degraded ATE 0.22->0.34
    # on the corrupted world without this gate).
    track_gate_px: float = 3.0
    # Install a window's refined motion j -> j+1 only when BOTH endpoint
    # frames keep at least this many gated observations. Late window frames
    # are observed only by tracks surviving the whole window; under heavy
    # corruption a tail frame can drop to a handful of noisy tracks whose
    # BA estimate is WORSE than VO (measured: 2-3 deg rotation spikes on
    # exactly the tail motions at KITTI size). The degraded-frame contract
    # (keep the VO motion) applies per-motion here, as the reference keeps
    # its pose when a solve fails (MonoVisualOdometry.cpp:47-51 semantics).
    min_frame_obs: int = 15
    # How window tracks are extended frame-to-frame:
    #   "chain": classic frame-(j-1)->j KLT (the OpenCV consumer-loop
    #     behavior the reference assumes). Drift random-walks with window
    #     position (median 2.5 px by the 5th frame on the corrupted
    #     KITTI-size world) but is near-INDEPENDENT across tracks, so BA
    #     averages it away.
    #   "template": KLT against the track's BIRTH template (window frame 0)
    #     initialized from the chained position. Measured WORSE end-to-end
    #     (ATE-after-BA 0.092 vs 0.056 m at the bench config): forward
    #     motion scales the scene ~4%/frame, and translation-only LK against
    #     a stale template turns that into a drift that is CORRELATED across
    #     tracks — exactly the error component BA cannot average away.
    track_mode: str = "chain"


class FullSystemOutput(NamedTuple):
    packed: jax.Array  # (B', 20) per-step VO outputs (pipeline packing)
    refined_motions: jax.Array  # (K, W-1, 4, 4) BA-refined window motions
    ba_cost: jax.Array  # (K,) final robust cost per window
    ba_converged: jax.Array  # (K,) bool
    n_track_obs: jax.Array  # (K,) BA observations actually used per window
    n_frame_obs: jax.Array  # (K, W) gated observations per window frame


def window_starts(n_frames: int, window: int, ba_rate: int) -> np.ndarray:
    """Static window schedule: the reference refines the last `window` poses
    every `ba_rate` frames once the window is full; the equivalent tiling is
    windows starting at 0, ba_rate, 2*ba_rate, ... while they fit."""
    if n_frames < window:
        return np.zeros((0,), np.int32)
    return np.arange(0, n_frames - window + 1, ba_rate, dtype=np.int32)


def _detect_and_match(left, right, cfg: PipelineConfig):
    """Grid-GFTT detection + ZNCC stereo match on one frame (the window's
    birth frame)."""
    feats, _, v0 = im.detect_features_grid(
        left, max_features=cfg.max_features, quality_level=cfg.detect_quality
    )
    f_right, _, sv = fe.match_stereo(left, right, feats, v0, cfg.matcher)
    return feats, f_right, v0 & sv


def _build_window_tracks(
    lf: jax.Array,  # (n, H, W) float32 left frames
    rf: jax.Array,  # (n, H, W) float32 right frames
    starts: jax.Array,  # (K,) int32
    cfg: SmootherConfig,
) -> tuple[jax.Array, jax.Array]:
    """Track tables for K windows at once: detect in each window's first
    frame, then KLT + stereo-match through the remaining window-1 frames.

    vmapped over windows — the analogue of the reference's per-frame
    WBA_Point bookkeeping (feature_types.h:122-197) with the sequential
    dependency confined to the (small, static) window length.

    Returns (obs (K, W, M, 4) [ul,vl,ur,vr], mask (K, W, M) bool). A track's
    mask is monotone: once lost it stays lost (reference tracks are dropped
    on tracking failure the same way).
    """
    p = cfg.pipe
    W = cfg.window

    l0, r0 = lf[starts], rf[starts]  # (K, H, W)
    feats, f_right, valid = jax.vmap(
        lambda a, b: _detect_and_match(a, b, p)
    )(l0, r0)

    obs_slices = [jnp.concatenate([feats, f_right], axis=-1)]  # (K, M, 4)
    mask_slices = [valid]
    pts = feats
    disp = feats[..., 0] - f_right[..., 0]
    pyr0 = jax.vmap(lambda x: tuple(im.build_pyramid(x, p.klt.n_levels)))(l0)
    pyr_prev = pyr0

    for j in range(1, W):
        lj, rj = lf[starts + j], rf[starts + j]
        pyr_cur = jax.vmap(
            lambda x: tuple(im.build_pyramid(x, p.klt.n_levels))
        )(lj)
        if cfg.track_mode == "template":
            # anchor on the birth template; the chained position from the
            # previous frame seeds the solve so only the incremental motion
            # must converge (see SmootherConfig.track_mode)
            tracked = jax.vmap(
                lambda ip, inx, f0, v, guess, pp, pc: fe.klt_track(
                    ip, inx, f0, v, p.klt, init_next=guess,
                    pyr_prev=pp, pyr_next=pc
                )
            )(l0, lj, feats, valid, pts, pyr0, pyr_cur)
        else:
            tracked = jax.vmap(
                lambda ip, inx, pt, v, pp, pc: fe.klt_track(
                    ip, inx, pt, v, p.klt, pyr_prev=pp, pyr_next=pc
                )
            )(l0, lj, pts, valid, pyr_prev, pyr_cur)
        fr, _, sv = jax.vmap(
            lambda a, b, f, v, d: fe.match_stereo(
                a, b, f, v, p.matcher, d_prior=d
            )
        )(lj, rj, tracked.pts, tracked.valid, disp)
        valid = valid & tracked.valid & sv
        obs_slices.append(jnp.concatenate([tracked.pts, fr], axis=-1))
        mask_slices.append(valid)
        pts = tracked.pts
        disp = tracked.pts[..., 0] - fr[..., 0]
        pyr_prev = pyr_cur

    obs = jnp.stack(obs_slices, axis=1)  # (K, W, M, 4)
    mask = jnp.stack(mask_slices, axis=1)  # (K, W, M)
    return obs, mask


def _inv_se3(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (cheaper and better-conditioned than a
    general 4x4 inverse)."""
    R = T[:3, :3]
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R.T)
    return out.at[:3, 3].set(-R.T @ T[:3, 3])


def _cam6_from_T(T: jax.Array) -> jax.Array:
    return jnp.concatenate([lie.so3_log(T[:3, :3]), T[:3, 3]])


def _T_from_cam6(c: jax.Array) -> jax.Array:
    T = jnp.eye(4, dtype=c.dtype)
    T = T.at[:3, :3].set(lie.so3_exp(c[:3]))
    return T.at[:3, 3].set(c[3:6])


def _init_window_problem(
    motions: jax.Array,  # (B, 4, 4) step motions (prev->cur), VO chain
    start: jax.Array,  # () int32 window start frame
    obs: jax.Array,  # (W, M, 4)
    mask: jax.Array,  # (W, M)
    cfg: SmootherConfig,
) -> BAProblem:
    """BAProblem for one window in the window-frame-0 gauge: cams chained
    from the VO motions, points triangulated from the birth-frame disparity
    (project3D semantics, StereoVisualOdometry.cpp:22-32)."""
    W = cfg.window
    p = cfg.pipe.vo
    # fenced: chaining up to W-1 4x4 products at the TPU's default bf16-pass
    # precision puts ~0.01 rad of noise on the init rotations — ~7 px of
    # systematic reprojection shift at KITTI focal lengths, which the 3-px
    # track gate below then turns into mass misclassification
    with jax.default_matmul_precision("highest"):
        cams = [jnp.zeros(6, motions.dtype)]
        T = jnp.eye(4, dtype=motions.dtype)
        for j in range(1, W):
            T = jax.lax.dynamic_index_in_dim(
                motions, start + j - 1, axis=0, keepdims=False
            ) @ T
            cams.append(_cam6_from_T(T))
        cam0 = jnp.stack(cams)  # (W, 6) world(=frame0)->cam
    pts = geo.triangulate_disparity(
        obs[0, :, 0:2], obs[0, :, 2:4], p.intr1, p.intr2, p.baseline
    )  # (M, 3) in frame-0 camera coords == gauge world
    keep = mask[0] & (jnp.sum(mask, axis=0) >= cfg.ba_min_obs)

    # track gate vs the VO-chained init (see SmootherConfig.track_gate_px)
    gate_cfg = BAConfig(intr=p.intr1, baseline=float(p.baseline))
    keep = keep & gate_tracks(cam0, pts, obs, mask, gate_cfg,
                              cfg.track_gate_px)
    return BAProblem(cam=cam0, pts=pts, obs=obs, mask=mask & keep[None, :])


@partial(jax.jit, static_argnames=("cfg", "chunk", "wchunk"))
def full_system_scan(
    ls: jax.Array,  # (n, H, W) staged frames (uint8 wire format or f32)
    rs: jax.Array,
    keys: jax.Array,  # (>= ceil((n-1)/chunk)*chunk,) RANSAC keys
    cfg: SmootherConfig,
    chunk: int = 8,
    wchunk: int = 4,  # windows processed per lax.map group (bounds memory)
) -> FullSystemOutput:
    """The whole integrated system in ONE dispatch: batched VO + window
    tracks + batched BA. ``wchunk`` bounds peak memory of the window stage
    the same way ``chunk`` bounds the VO stage."""
    n = int(ls.shape[0])
    b = n - 1
    packed = _vo_scan_packed(ls, rs, keys, cfg.pipe, chunk)  # (gc, 20)
    motions = packed[:b, :16].reshape(b, 4, 4)
    success = packed[:b, 16] > 0.5
    motions = jnp.where(
        success[:, None, None], motions, jnp.eye(4, dtype=motions.dtype)
    )

    starts_np = window_starts(n, cfg.window, cfg.ba_rate)
    k = len(starts_np)
    if k == 0:
        z = jnp.zeros((0,), jnp.float32)
        return FullSystemOutput(
            packed, jnp.zeros((0, cfg.window - 1, 4, 4), jnp.float32),
            z, z.astype(bool), jnp.zeros((0,), jnp.int32),
            jnp.zeros((0, cfg.window), jnp.int32),
        )
    # pad the window count to a multiple of wchunk (repeat the last window)
    g = -(-k // wchunk)
    starts = jnp.asarray(
        np.concatenate([starts_np, np.full(g * wchunk - k, starts_np[-1],
                                           np.int32)])
    )

    lf = ls.astype(jnp.float32)
    rf = rs.astype(jnp.float32)
    ba_cfg = BAConfig(
        intr=cfg.pipe.vo.intr1,
        baseline=float(cfg.pipe.vo.baseline),
        n_fixed=cfg.n_fixed,
        max_iter=cfg.ba_max_iter,
        huber_delta=cfg.huber_delta,
    )

    def solve_group(start_group):  # (wchunk,)
        obs, mask = _build_window_tracks(lf, rf, start_group, cfg)
        problems = jax.vmap(
            lambda s, o, m: _init_window_problem(motions, s, o, m, cfg)
        )(start_group, obs, mask)
        res = jax.vmap(lambda pr: ba_solve(pr, ba_cfg))(problems)
        # refined window motions m_j = T_{j+1} @ inv(T_j). MUST be fenced to
        # full f32: under the TPU's default bf16-pass matmul these 4x4
        # products pick up ~4e-3 entry noise, i.e. ~0.1-0.2 deg of spurious
        # rotation PER MOTION on an exactly-converged BA solution — chained
        # over a sequence that random walk alone degraded ATE 0.064->0.129 m
        # at the round-3 bench config while the solver itself was fine
        # (root-caused round 4: batched-vs-solo cam diff was 1e-6).
        with jax.default_matmul_precision("highest"):
            Ts = jax.vmap(jax.vmap(_T_from_cam6))(res.cam)  # (wchunk,W,4,4)
            ref = jnp.einsum(
                "kwij,kwjl->kwil",
                Ts[:, 1:],
                jax.vmap(jax.vmap(_inv_se3))(Ts[:, :-1]),
            )
        n_obs = jnp.sum(problems.mask, axis=(1, 2)).astype(jnp.int32)
        n_frame = jnp.sum(problems.mask, axis=2).astype(jnp.int32)  # (k, W)
        return ref, res.cost, res.converged, n_obs, n_frame

    groups = starts.reshape(g, wchunk)
    ref, cost, conv, n_obs, n_frame = jax.lax.map(solve_group, groups)
    unpad = lambda x: x.reshape((g * wchunk,) + x.shape[2:])[:k]
    return FullSystemOutput(
        packed=packed,
        refined_motions=unpad(ref),
        ba_cost=unpad(cost),
        ba_converged=unpad(conv),
        n_track_obs=unpad(n_obs),
        n_frame_obs=unpad(n_frame),
    )


class FullSystemResult(NamedTuple):
    traj_vo: np.ndarray  # (N, 4, 4) cam-to-world, VO chain only
    traj_ba: np.ndarray  # (N, 4, 4) cam-to-world, BA-refined
    per_frame: np.ndarray  # (B, 20) packed VO stats
    ba_cost: np.ndarray  # (K,)
    ba_converged: np.ndarray  # (K,)
    n_track_obs: np.ndarray  # (K,)


def compose_trajectories(
    out: FullSystemOutput, n_frames: int, cfg: SmootherConfig
) -> FullSystemResult:
    """Host-side float64 pose-chain composition for both the raw VO chain
    and the BA-refined chain (refined motions replace the VO motions in
    each window's span, in window order — the sequential consumer's
    write-back semantics, models/odometry.py:_run_ba)."""
    b = n_frames - 1
    packed = np.asarray(out.packed)[:b]
    motions = packed[:, :16].reshape(b, 4, 4).astype(np.float64)
    success = packed[:, 16] > 0.5
    motions[~success] = np.eye(4)

    refined = np.asarray(out.refined_motions, np.float64)
    n_frame_obs = np.asarray(out.n_frame_obs)
    starts = window_starts(n_frames, cfg.window, cfg.ba_rate)
    motions_ba = motions.copy()
    for i, s in enumerate(starts):
        for j in range(cfg.window - 1):
            # per-motion degraded contract: both endpoint frames must keep
            # enough gated observations, else the VO motion stands
            if (n_frame_obs[i, j] >= cfg.min_frame_obs
                    and n_frame_obs[i, j + 1] >= cfg.min_frame_obs):
                motions_ba[s + j] = refined[i, j]

    def chain(ms):
        traj = np.empty((n_frames, 4, 4))
        traj[0] = np.eye(4)
        for i in range(b):
            traj[i + 1] = traj[i] @ np.linalg.inv(ms[i])
        return traj

    return FullSystemResult(
        traj_vo=chain(motions),
        traj_ba=chain(motions_ba),
        per_frame=packed,
        ba_cost=np.asarray(out.ba_cost),
        ba_converged=np.asarray(out.ba_converged),
        n_track_obs=np.asarray(out.n_track_obs),
    )


def run_full_system(
    frames: list[tuple[np.ndarray, np.ndarray]],
    cfg: SmootherConfig,
    seed: int = 0,
    chunk: int = 8,
    wchunk: int = 4,
) -> FullSystemResult:
    """Convenience host API: stage frames, run the one-dispatch integrated
    system, compose both trajectories."""
    n = len(frames)
    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8)
    )
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8)
    )
    g = -(-(n - 1) // chunk)
    keys = jax.random.split(jax.random.key(seed), g * chunk)
    out = full_system_scan(ls, rs, keys, cfg, chunk=chunk, wchunk=wchunk)
    return compose_trajectories(jax.device_get(out), n, cfg)
