"""Pose-solve sub-ablation in the headline-bench regime.

Splits the ~1.3 ms/frame RANSAC/GN stage (bench_stage_split.json) into:
triangulation, hypothesis generation+polish (200 x 3pt closed form + GN),
hypothesis scoring/selection, and the final LM refinement. Same in-situ
methodology as profile_klt_internals.py.

Run: python benchmarks/profile_solve_internals.py   (on the TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from uasl_motion_estimation_tpu.models import frontend as fe
from uasl_motion_estimation_tpu.models import stereo_vo as sv
from uasl_motion_estimation_tpu.models.pipeline import default_config
from uasl_motion_estimation_tpu.ops import geometry as geo
from uasl_motion_estimation_tpu.ops import lie, pnp
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "13"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def solve_truncated(matches, valid, key, p, mode):
    dtype = matches.dtype
    init = jnp.zeros(6, dtype)
    pts3 = geo.triangulate_disparity(
        matches[:, 0], matches[:, 1], p.intr1, p.intr2, p.baseline
    )
    obs = matches[:, 2:4]
    if mode == "tri":
        return jnp.sum(pts3) + jnp.sum(obs)

    valid_f = valid.astype(dtype)
    samples = sv._sample_hypotheses(key, p.n_ransac, valid)
    sample_uv = matches[:, 2][samples]
    spread_ok = jnp.abs(sv._triangle_area(sample_uv)) > p.min_spread_area
    sample_valid = jnp.all(valid[samples], axis=-1) & spread_ok
    pts3_cur = geo.triangulate_disparity(
        matches[:, 2], matches[:, 3], p.intr1, p.intr2, p.baseline
    )

    def run_hyp(idx3):
        Rh, th, ok = pnp.rigid_align_3pt(pts3[idx3], pts3_cur[idx3])
        seed = jnp.concatenate([lie.R_to_euler(Rh.T), th])
        seed = jnp.where(ok & jnp.all(jnp.isfinite(seed)), seed, init)
        return sv._gn_fixed(seed, pts3[idx3], obs[idx3], valid_f[idx3], p,
                            p.ransac_gn_iters)

    hyp_states = jax.vmap(run_hyp)(samples)
    if mode == "hyps":
        return jnp.sum(hyp_states) + jnp.sum(sample_valid)

    errs = jax.vmap(lambda s: sv._sq_reproj_error(s, pts3, obs, p))(hyp_states)
    inl = (errs < p.inlier_threshold**2) & valid[None, :]
    counts = jnp.where(sample_valid, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(counts)
    inlier_mask = inl[best] & (counts[best] > 0)
    refine_init = jnp.where(counts[best] > 0, hyp_states[best], init)
    if mode == "score":
        return jnp.sum(refine_init) + jnp.sum(inlier_mask)

    res = sv.stereo_vo_solve(matches, valid, key, p)
    return jnp.sum(res.motion) + res.n_inliers


def make_steps(cfg):
    def prefix(pl, pr, cl, cr):
        pl, pr, cl, cr = (x.astype(jnp.float32) for x in (pl, pr, cl, cr))
        return fe.quad_match_frames(
            pl, pr, cl, cr, max_features=cfg.max_features,
            matcher=cfg.matcher, klt=cfg.klt,
            detect_kwargs=(("nms_radius", cfg.detect_nms_radius),
                           ("quality_level", cfg.detect_quality)),
            detector=cfg.detector,
        )

    def s_base(pl, pr, cl, cr, key):
        qm = prefix(pl, pr, cl, cr)
        return jnp.sum(qm.uv) + jnp.sum(qm.valid)

    steps = [("base (front-end)", s_base)]
    for mode in ("tri", "hyps", "score", "full"):
        def s(pl, pr, cl, cr, key, mode=mode):
            qm = prefix(pl, pr, cl, cr)
            return jnp.sum(solve_truncated(qm.uv, qm.valid, key, cfg.vo, mode))

        steps.append((f"+ solve[{mode}]", s))
    return steps


def seq_runner(step, chunk):
    @jax.jit
    def run(pl, pr, cl, cr, keys):
        g = pl.shape[0] // chunk

        def one_chunk(args):
            a, b, c, d, k = args
            return jax.vmap(step)(a, b, c, d, k)

        grouped = tuple(
            x.reshape((g, chunk) + x.shape[1:]) for x in (pl, pr, cl, cr, keys)
        )
        out = jax.lax.map(one_chunk, grouped)
        return jnp.sum(out)

    return run


def main():
    rig = CameraRig()
    seq = SyntheticStereoSequence(n_frames=N_FRAMES, rig=rig, seed=0)
    frames = [seq.frame(i) for i in range(N_FRAMES)]
    cfg = default_config(Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline)

    ls = np.stack([np.asarray(f[0]) for f in frames]).astype(np.uint8)
    rs = np.stack([np.asarray(f[1]) for f in frames]).astype(np.uint8)
    ls = jax.device_put(ls)
    rs = jax.device_put(rs)
    np.asarray(ls[0, :1, :1])

    b = N_FRAMES - 1
    g = -(-b // CHUNK)
    idx_prev = np.clip(np.arange(g * CHUNK), 0, b - 1)
    idx_cur = idx_prev + 1
    keys = jax.random.split(jax.random.key(0), g * CHUNK)
    args = (ls[idx_prev], rs[idx_prev], ls[idx_cur], rs[idx_cur], keys)

    print(f"device: {jax.devices()[0].device_kind}  frames={b} chunk={CHUNK}",
          flush=True)
    results = {"device": str(jax.devices()[0].device_kind),
               "frames": b, "chunk": CHUNK}
    prev = None
    for name, step in make_steps(cfg):
        run = seq_runner(step, CHUNK)
        np.asarray(run(*args))
        np.asarray(run(*args))
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            times.append(time.perf_counter() - t0)
        per = float(np.median(times)) / b * 1e3
        d = 0.0 if prev is None else per - prev
        results[name] = {"ms_per_frame": per, "delta_ms": d}
        print(f"  {name:24s} {per:8.3f} ms/frame   (+{d:7.3f})", flush=True)
        prev = per

    out = REPO / "benchmarks" / "solve_internals.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
