"""Stage budget of the unified engine at the bench config: cumulative
timings of (a) window track tables only, (b) + per-motion VO, (c) + BA
(the full engine). Differences give the per-stage budget. Each stage is a
separate jit of a prefix of unified_solve_group, timed device_get-fenced.
Writes benchmarks/unified_stage_split.json.
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

    from uasl_motion_estimation_tpu.models import smoother as sm
    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        unified_system_scan,
        unified_window_starts,
    )
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
    W = cfg.window

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    key = jax.random.key(0)

    starts_np = unified_window_starts(N_FRAMES, W, cfg.ba_rate)
    k = len(starts_np)
    g = -(-k // WCHUNK)
    starts = jnp.asarray(np.concatenate(
        [starts_np, np.full(g * WCHUNK - k, starts_np[-1], np.int32)]
    )).reshape(g, WCHUNK)

    @partial(jax.jit, static_argnames=())
    def tracks_only(ls, rs, groups):
        lf, rf = ls.astype(jnp.float32), rs.astype(jnp.float32)
        return jax.lax.map(
            lambda sg: sm._build_window_tracks(lf, rf, sg, cfg), groups
        )

    @partial(jax.jit, static_argnames=())
    def tracks_vo(ls, rs, groups):
        lf, rf = ls.astype(jnp.float32), rs.astype(jnp.float32)

        def group(sg):
            obs, mask = sm._build_window_tracks(lf, rf, sg, cfg)
            quv = jnp.stack(
                [obs[:, :-1, :, 0:2], obs[:, :-1, :, 2:4],
                 obs[:, 1:, :, 0:2], obs[:, 1:, :, 2:4]], axis=-2)
            qvalid = mask[:, 1:]
            midx = sg[:, None] + jnp.arange(W - 1, dtype=jnp.int32)
            keys = jax.vmap(jax.vmap(
                lambda i: jax.random.fold_in(key, i)))(midx)
            vo = jax.vmap(jax.vmap(
                lambda m, v, ky: sm.stereo_vo_solve(m, v, ky, cfg.pipe.vo)
            ))(quv, qvalid, keys)
            return vo.motion, vo.success

        return jax.lax.map(group, groups)

    def timeit(fn, *args):
        out = jax.device_get(fn(*args))  # compile + warm
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = jax.device_get(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_tracks = timeit(tracks_only, ls, rs, starts)
    t_vo = timeit(tracks_vo, ls, rs, starts)
    t_full = timeit(
        lambda a, b: unified_system_scan(a, b, key, cfg, wchunk=WCHUNK),
        ls, rs)

    b = N_FRAMES - 1
    result = {
        "metric": "unified-engine stage budget (ms/frame, KITTI-size "
                  "corrupted, cumulative-prefix jits)",
        "value": round(1e3 * t_full / b, 3),
        "unit": "ms/frame full engine",
        "tracks_ms_per_frame": round(1e3 * t_tracks / b, 3),
        "vo_ms_per_frame": round(1e3 * (t_vo - t_tracks) / b, 3),
        "ba_ms_per_frame": round(1e3 * (t_full - t_vo) / b, 3),
        "note": "tracks = detection + KLT + ZNCC tables; vo = vmapped "
                "200-hypothesis RANSAC per motion; ba = window init + "
                "gate + batched LM-Schur + composition. Stage deltas from "
                "cumulative prefixes share XLA fusion context with the "
                "full engine.",
    }
    print(json.dumps(result))
    (REPO / "benchmarks" / "unified_stage_split.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
