"""Stage split measured INSIDE the exact headline-bench execution regime.

The microbenchmark tables (profile_stages.py / profile_variants.py) time each
stage as its own dispatch; on the tunneled backend those numbers mix device
compute with output-fetch and per-dispatch latencies and do not add up to the
headline. This harness instead times stage-TRUNCATED step functions through
the very same path the bench uses — device-resident uint8 frames, lax.map
over chunk groups, one dispatch for the whole sequence, device_get fence —
so consecutive rows differ by exactly one stage and the deltas are the true
per-stage cost in situ.

Run: python benchmarks/profile_bench_stages.py   (on the TPU)
Writes benchmarks/bench_stage_split.json.
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
from uasl_motion_estimation_tpu.models.pipeline import default_config
from uasl_motion_estimation_tpu.models.stereo_vo import stereo_vo_solve
from uasl_motion_estimation_tpu.ops import image as im
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "13"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def make_steps(cfg):
    """Stage-truncated variants of models.pipeline.vo_step; each returns a
    small array so the output fetch is negligible and constant across rows."""

    def to_f32(*imgs):
        return tuple(x.astype(jnp.float32) for x in imgs)

    def s0_convert(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        return pl[0, 0] + pr[0, 0] + cl[0, 0] + cr[0, 0]

    def detect(img):
        return im.detect_features_grid(
            img, max_features=cfg.max_features, quality_level=cfg.detect_quality
        )

    def s1_detect(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        f, s, v = detect(pl)
        return jnp.sum(f) + jnp.sum(v)

    def s2_match_prev(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        f, s, v0 = detect(pl)
        f2, _, v1 = fe.match_stereo(pl, pr, f, v0, cfg.matcher)
        return jnp.sum(f2) + jnp.sum(v1)

    def s3_klt(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        f, s, v0 = detect(pl)
        f2, _, v1 = fe.match_stereo(pl, pr, f, v0, cfg.matcher)
        tr = fe.klt_track(pl, cl, f, v1, cfg.klt)
        return jnp.sum(tr.pts) + jnp.sum(tr.valid)

    def s4_frontend(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        qm = fe.quad_match_frames(
            pl, pr, cl, cr, max_features=cfg.max_features,
            matcher=cfg.matcher, klt=cfg.klt,
            detect_kwargs=(("nms_radius", cfg.detect_nms_radius),
                           ("quality_level", cfg.detect_quality)),
            detector=cfg.detector,
        )
        return jnp.sum(qm.uv) + jnp.sum(qm.valid)

    def s5_full(pl, pr, cl, cr, key):
        pl, pr, cl, cr = to_f32(pl, pr, cl, cr)
        qm = fe.quad_match_frames(
            pl, pr, cl, cr, max_features=cfg.max_features,
            matcher=cfg.matcher, klt=cfg.klt,
            detect_kwargs=(("nms_radius", cfg.detect_nms_radius),
                           ("quality_level", cfg.detect_quality)),
            detector=cfg.detector,
        )
        res = stereo_vo_solve(qm.uv, qm.valid, key, cfg.vo)
        return jnp.sum(res.motion) + res.n_inliers

    return [
        ("0 uint8->f32 convert only", s0_convert),
        ("1 + detect (grid GFTT)", s1_detect),
        ("2 + ZNCC match prev pair", s2_match_prev),
        ("3 + KLT track", s3_klt),
        ("4 + ZNCC match cur pair", s4_frontend),
        ("5 + RANSAC/GN pose solve", s5_full),
    ]


def seq_runner(step, cfg, chunk):
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
    prev = 0.0
    for name, step in make_steps(cfg):
        run = seq_runner(step, cfg, CHUNK)
        np.asarray(run(*args))  # compile + warm
        np.asarray(run(*args))
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            times.append(time.perf_counter() - t0)
        per = float(np.median(times)) / b * 1e3
        results[name] = {"ms_per_frame": per, "delta_ms": per - prev}
        print(f"  {name:28s} {per:8.3f} ms/frame   (+{per - prev:7.3f})",
              flush=True)
        prev = per

    out = REPO / "benchmarks" / "bench_stage_split.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
