"""Batched-vs-solo discrepancy probe: run the exact full-system wchunk
group (starts [0,4,8,12,16]) through vmapped track building + vmapped BA
and compare window 16's refined motions against the solo solve of the same
window. Isolates whether batching (tracks or solver) changes results.
Debug tool for VERDICT r3 item 1.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CHUNK = 13
TRACK_MODE = os.environ.get("TRACK_MODE", "chain")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import (
        _vo_scan_packed,
        default_config,
    )
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        _build_window_tracks,
        _init_window_problem,
        _T_from_cam6,
    )
    from uasl_motion_estimation_tpu.solvers.ba import BAConfig, ba_solve
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        CorruptionConfig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    seq = SyntheticStereoSequence(
        n_frames=N_FRAMES, rig=rig, seed=0, corruption=CorruptionConfig()
    )
    frames = [seq.frame(i) for i in range(N_FRAMES)]
    gt_poses = seq.poses

    pipe_cfg = default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    )
    cfg = SmootherConfig(pipe=pipe_cfg)._replace(track_mode=TRACK_MODE)
    W = cfg.window

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    b = N_FRAMES - 1
    g = -(-b // CHUNK)
    keys = jax.random.split(jax.random.key(0), g * CHUNK)
    packed = np.asarray(_vo_scan_packed(ls, rs, keys, pipe_cfg, CHUNK))[:b]
    motions_vo = packed[:, :16].reshape(b, 4, 4).copy()
    motions_vo[packed[:, 16] <= 0.5] = np.eye(4, dtype=np.float32)
    motions_vo = jnp.asarray(motions_vo, jnp.float32)

    lf, rf = ls.astype(jnp.float32), rs.astype(jnp.float32)
    ba_cfg = BAConfig(
        intr=pipe_cfg.vo.intr1, baseline=float(pipe_cfg.vo.baseline),
        n_fixed=cfg.n_fixed, max_iter=cfg.ba_max_iter,
        huber_delta=cfg.huber_delta,
    )
    gt_m = np.stack([
        np.linalg.inv(gt_poses[j + 1]) @ gt_poses[j] for j in range(b)
    ]).astype(np.float64)

    def motions_of(cams):
        Ts = [np.asarray(_T_from_cam6(cams[j]), np.float64) for j in range(W)]
        return [Ts[j + 1] @ np.linalg.inv(Ts[j]) for j in range(W - 1)]

    def errs(ms, s):
        out = []
        for j, m_ref in enumerate(ms):
            gm = gt_m[s + j]
            dt = np.linalg.norm(m_ref[:3, 3] - gm[:3, 3]) * 1e3
            Rr = m_ref[:3, :3].T @ gm[:3, :3]
            ang = np.degrees(np.arccos(np.clip((np.trace(Rr) - 1) / 2, -1, 1)))
            out.append(f"{dt:6.2f}mm {ang*1e3:7.1f}md")
        return " | ".join(out)

    # --- batched: the exact full-system group ---
    group = jnp.asarray([0, 4, 8, 12, 16], jnp.int32)

    @jax.jit
    def solve_group(starts):
        obs, mask = _build_window_tracks(lf, rf, starts, cfg)
        probs = jax.vmap(
            lambda s, o, m: _init_window_problem(motions_vo, s, o, m, cfg)
        )(starts, obs, mask)
        res = jax.vmap(lambda p: ba_solve(p, ba_cfg))(probs)
        return obs, mask, probs, res

    obs_b, mask_b, probs_b, res_b = solve_group(group)

    # --- solo: same window built and solved alone ---
    @jax.jit
    def solve_solo(start):
        starts = start[None]
        obs, mask = _build_window_tracks(lf, rf, starts, cfg)
        prob = _init_window_problem(motions_vo, start, obs[0], mask[0], cfg)
        return obs, mask, prob, ba_solve(prob, ba_cfg)

    obs_s, mask_s, prob_s, res_s = solve_solo(jnp.asarray(16, jnp.int32))

    # compare track tables
    same_obs = np.allclose(np.asarray(obs_b[4]), np.asarray(obs_s[0]))
    dmax = float(np.max(np.abs(np.asarray(obs_b[4]) - np.asarray(obs_s[0]))))
    same_mask = bool(np.all(np.asarray(mask_b[4]) == np.asarray(mask_s[0])))
    gate_b = np.asarray(probs_b.mask[4]).sum(1)
    gate_s = np.asarray(prob_s.mask).sum(1)
    print(f"tracks identical: obs={same_obs} (max |d|={dmax:.4f}) "
          f"mask={same_mask}")
    print(f"gated obs/frame batched={gate_b} solo={gate_s}")
    print(f"iters batched={int(res_b.n_iter[4])} solo={int(res_s.n_iter)} "
          f"cost batched={float(res_b.cost[4]):.4f} solo={float(res_s.cost):.4f}")
    cam_d = float(np.max(np.abs(np.asarray(res_b.cam[4]) - np.asarray(res_s.cam))))
    print(f"max |cam diff| = {cam_d:.6f}")
    print("batched w16:", errs(motions_of(np.asarray(res_b.cam[4])), 16))
    print("solo    w16:", errs(motions_of(np.asarray(res_s.cam)), 16))


if __name__ == "__main__":
    main()
