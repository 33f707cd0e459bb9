"""Fine-grained budget of the unified engine's dominant stage (track
tables = 4.36 of 5.3 ms/frame, unified_stage_split.json): cumulative
prefixes of _build_window_tracks — (a) detection+stereo match at window
births, (b) + per-frame pyramids, (c) + KLT extension, (d) full table
(adds the per-frame ZNCC rematch). Writes
benchmarks/track_stage_split.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
WCHUNK = int(os.environ.get("BENCH_WCHUNK", "5"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models import frontend as fe
    from uasl_motion_estimation_tpu.models import smoother as sm
    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        unified_window_starts,
    )
    from uasl_motion_estimation_tpu.ops import image as im
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
    cfg = SmootherConfig(pipe=default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    ))
    p = cfg.pipe
    W = cfg.window

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))

    starts_np = unified_window_starts(N_FRAMES, W, cfg.ba_rate)
    k = len(starts_np)
    g = -(-k // WCHUNK)
    groups = jnp.asarray(np.concatenate(
        [starts_np, np.full(g * WCHUNK - k, starts_np[-1], np.int32)]
    )).reshape(g, WCHUNK)

    def jit_over_groups(body):
        @jax.jit
        def fn(ls, rs, groups):
            lf, rf = ls.astype(jnp.float32), rs.astype(jnp.float32)
            return jax.lax.map(lambda sg: body(lf, rf, sg), groups)
        return fn

    # every prefix reduces its products to ONE scalar: fetching stage
    # intermediates (pyramids are ~2.5 MB/frame) would measure transfer,
    # not compute, and returning nothing would let XLA dead-code the stage
    def detect_only(lf, rf, sg):
        l0, r0 = lf[sg], rf[sg]
        feats, f_right, valid = jax.vmap(
            lambda a, b: sm._detect_and_match(a, b, p))(l0, r0)
        return jnp.sum(feats) + jnp.sum(f_right) + jnp.sum(valid)

    def _pyrs(lf, sg):
        return [jax.vmap(
            lambda x: tuple(im.build_pyramid(x, p.klt.n_levels))
        )(lf[sg + j]) for j in range(W)]

    def detect_pyr(lf, rf, sg):
        acc = detect_only(lf, rf, sg)
        for pyr in _pyrs(lf, sg):
            acc = acc + sum(jnp.sum(lvl) for lvl in pyr)
        return acc

    def detect_pyr_klt(lf, rf, sg):
        l0, r0 = lf[sg], rf[sg]
        feats, f_right, valid = jax.vmap(
            lambda a, b: sm._detect_and_match(a, b, p))(l0, r0)
        pyrs = _pyrs(lf, sg)
        acc = jnp.sum(feats) + jnp.sum(f_right)
        acc = acc + sum(sum(jnp.sum(lvl) for lvl in pyr) for pyr in pyrs)
        pts = feats
        for j in range(1, W):
            tracked = jax.vmap(
                lambda ip, inx, pt, v, pp, pc: fe.klt_track(
                    ip, inx, pt, v, p.klt, pyr_prev=pp, pyr_next=pc)
            )(lf[sg + j - 1], lf[sg + j], pts, valid, pyrs[j - 1], pyrs[j])
            valid = valid & tracked.valid
            pts = tracked.pts
            acc = acc + jnp.sum(pts)
        return acc

    def full_body(lf, rf, sg):
        obs, mask = sm._build_window_tracks(lf, rf, sg, cfg)
        return jnp.sum(obs) + jnp.sum(mask)

    full = jit_over_groups(full_body)

    def timeit(fn):
        jax.device_get(fn(ls, rs, groups))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(fn(ls, rs, groups))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_det = timeit(jit_over_groups(detect_only))
    t_pyr = timeit(jit_over_groups(detect_pyr))
    t_klt = timeit(jit_over_groups(detect_pyr_klt))
    t_all = timeit(full)

    b = N_FRAMES - 1
    result = {
        "metric": "window-track-stage budget (ms/frame, cumulative-prefix "
                  "jits at the bench config)",
        "value": round(1e3 * t_all / b, 3),
        "unit": "ms/frame full track tables",
        "detect_match_births_ms": round(1e3 * t_det / b, 3),
        "pyramids_ms": round(1e3 * (t_pyr - t_det) / b, 3),
        "klt_ms": round(1e3 * (t_klt - t_pyr) / b, 3),
        "zncc_rematch_ms": round(1e3 * (t_all - t_klt) / b, 3),
        "note": "births = grid-GFTT + full-width ZNCC once per window; "
                "zncc_rematch = narrow d_prior search per tracked frame",
    }
    print(json.dumps(result))
    (REPO / "benchmarks" / "track_stage_split.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
