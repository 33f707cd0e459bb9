"""ZNCC-matcher sub-ablation in the headline-bench regime.

Attributes the ~1.3 ms/frame per match_stereo call (bench_stage_split.json)
to: strip gather, template gather, score-volume einsums, and the subpixel
refine iterations. Same in-situ methodology as profile_klt_internals.py.

Run: python benchmarks/profile_zncc_internals.py   (on the TPU)
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
from uasl_motion_estimation_tpu.ops import image as im
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "13"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def zncc_truncated(left, right, feats, valid, cfg, mode):
    h, w = left.shape
    d_max = cfg.max_disparity
    r = cfg.patch_radius
    k = 2 * r + 1
    npix = k * k
    eps = 1e-6

    xi = jnp.clip(jnp.round(feats[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(feats[:, 1]).astype(jnp.int32), 0, h - 1)

    strip_w = d_max + 2 * r
    strip_anchor = jnp.stack([xi - (d_max - 1) - r, yi - r], -1)
    strip = im.extract_tiles(right, strip_anchor, k, strip_w)
    if mode == "strip":
        return jnp.sum(strip[:, 0, 0])

    tpl_anchor = jnp.stack([xi - r, yi - r], -1)
    tpl = im.extract_tiles(left, tpl_anchor, k)
    if mode == "tpl":
        return jnp.sum(strip[:, 0, 0]) + jnp.sum(tpl[:, 0, 0])

    tpl0 = tpl - jnp.mean(tpl, axis=(-2, -1), keepdims=True)
    tnorm = jnp.sqrt(jnp.maximum(jnp.sum(tpl0 * tpl0, axis=(-2, -1)), eps))
    sh = jnp.stack(
        [jax.lax.slice_in_dim(strip, c, c + d_max, axis=2) for c in range(k)],
        axis=2,
    )
    corr = jnp.einsum("nkc,nkcd->nd", tpl0, sh, precision="highest")
    s1 = jnp.einsum("nkcd->nd", sh)
    s2 = jnp.einsum("nkcd,nkcd->nd", sh, sh, precision="highest")
    var_n = jnp.maximum(s2 - s1 * s1 / npix, eps)
    z = corr / (jnp.sqrt(var_n) * tnorm[:, None])
    z = jnp.flip(z, axis=-1)
    if mode == "volume":
        return jnp.sum(jnp.argmax(z, axis=-1))

    # parabola + refine path via the real matcher at selected refine_iters
    n_ref = {"refine0": 0, "refine1": 1, "full": cfg.refine_iters}[mode]
    cfg2 = cfg._replace(refine_iters=n_ref)
    fr, sc, v = fe.match_stereo(left, right, feats, valid, cfg2)
    return jnp.sum(fr) + jnp.sum(sc) + jnp.sum(v)


def make_steps(cfg):
    def prefix(pl):
        f, s, v0 = im.detect_features_grid(
            pl, max_features=cfg.max_features, quality_level=cfg.detect_quality
        )
        return f, v0

    def s_base(pl, pr, cl, cr, key):
        pl = pl.astype(jnp.float32)
        f, v0 = prefix(pl)
        return jnp.sum(f) + jnp.sum(v0)

    steps = [("base (convert+detect)", s_base)]
    for mode in ("strip", "tpl", "volume", "refine0", "refine1", "full"):
        def s(pl, pr, cl, cr, key, mode=mode):
            pl, pr = pl.astype(jnp.float32), pr.astype(jnp.float32)
            f, v0 = prefix(pl)
            return jnp.sum(zncc_truncated(pl, pr, f, v0, cfg.matcher, mode))

        steps.append((f"+ zncc[{mode}]", s))
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

    out = REPO / "benchmarks" / "zncc_internals.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
