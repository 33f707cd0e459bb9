"""KLT sub-ablation measured INSIDE the exact headline-bench regime.

bench_stage_split.json puts KLT at ~3.4 ms/frame — the largest stage. This
harness times progressively-truncated variants of models/frontend.klt_track
through the same execution path as the bench (device-resident uint8 frames,
lax.map over chunk groups, device_get fence) so the deltas attribute the cost
to pyramid build, template/gradient gathers, tile gathers, and the iteration
loop separately.

Run: python benchmarks/profile_klt_internals.py   (on the TPU)
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


def klt_truncated(img_prev, img_next, pts_prev, valid_prev, cfg, mode):
    """Copy of frontend.klt_track with a `mode` knob:
    pyr | template | tiles | iter1 | full-fori | full (matches library)."""
    r = cfg.window_radius
    k = 2 * r + 1
    margin = cfg.tile_margin
    tile_size = k + 2 * margin + 1
    npix = k * k

    pyr_prev = im.build_pyramid(img_prev, cfg.n_levels)
    pyr_next = im.build_pyramid(img_next, cfg.n_levels)
    if mode == "pyr":
        return sum(jnp.sum(p) for p in pyr_prev) + sum(
            jnp.sum(p) for p in pyr_next
        )

    d = jnp.zeros_like(pts_prev)
    eig_ok = jnp.ones_like(valid_prev)
    acc = 0.0

    for level in range(cfg.n_levels - 1, -1, -1):
        scale = 2.0**level
        p_prev = pts_prev / scale
        ip, inx = pyr_prev[level], pyr_next[level]

        t_big = im.extract_patches_sep(ip, p_prev, r + 1)
        tpl = t_big[:, 1:-1, 1:-1]
        sy = (3.0 * t_big[:, :-2, :] + 10.0 * t_big[:, 1:-1, :]
              + 3.0 * t_big[:, 2:, :]) / 16.0
        gxp = (sy[:, :, 2:] - sy[:, :, :-2]) * 0.5
        sx = (3.0 * t_big[:, :, :-2] + 10.0 * t_big[:, :, 1:-1]
              + 3.0 * t_big[:, :, 2:]) / 16.0
        gyp = (sx[:, 2:, :] - sx[:, :-2, :]) * 0.5

        a11 = jnp.sum(gxp * gxp, axis=(-2, -1))
        a12 = jnp.sum(gxp * gyp, axis=(-2, -1))
        a22 = jnp.sum(gyp * gyp, axis=(-2, -1))
        det = a11 * a22 - a12 * a12
        tr = a11 + a22
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        eig_ok = eig_ok & (min_eig / npix > cfg.min_eig_threshold)
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

        if mode == "template":
            acc = acc + jnp.sum(tpl) + jnp.sum(min_eig)
            continue

        anchor = jnp.floor(p_prev + d).astype(jnp.int32) - (r + margin)
        tiles = im.extract_tiles(inx, anchor, tile_size)
        anchor_f = anchor.astype(d.dtype)
        track_ok = valid_prev & eig_ok

        if mode == "tiles":
            acc = acc + jnp.sum(tiles[:, 0, 0]) + jnp.sum(min_eig)
            continue

        def step(dcur):
            off = p_prev + dcur - anchor_f - r
            patch = im.sample_tiles(tiles, off, k)
            err = patch - tpl
            b1 = jnp.sum(err * gxp, axis=(-2, -1))
            b2 = jnp.sum(err * gyp, axis=(-2, -1))
            dx = -(a22 * b1 - a12 * b2) * inv_det
            dy = -(a11 * b2 - a12 * b1) * inv_det
            upd = jnp.stack([dx, dy], axis=-1)
            ok = jnp.isfinite(upd).all(axis=-1, keepdims=True)
            dnew = dcur + jnp.where(ok, upd, 0.0)
            lo = anchor_f + r - p_prev
            hi = lo + (tile_size - k - 1)
            dnew = jnp.clip(dnew, lo, hi)
            live = jnp.where(track_ok[:, None], jnp.abs(dnew - dcur), 0.0)
            return dnew, jnp.max(live)

        if mode == "iter1":
            d, _ = step(d)
        elif mode == "full-fori":
            d = jax.lax.fori_loop(0, cfg.iters, lambda _, dc: step(dc)[0], d)
        else:  # full: while_loop with convergence exit (library behavior)
            def cond(c):
                i, _, delta = c
                return (i < cfg.iters) & (delta > cfg.converge_px)

            def body(c):
                i, dcur, _ = c
                dnew, delta = step(dcur)
                return i + 1, dnew, delta

            _, d, _ = jax.lax.while_loop(
                cond, body,
                (jnp.asarray(0, jnp.int32), d, jnp.asarray(jnp.inf, d.dtype)),
            )
        if level > 0:
            d = d * 2.0

    if mode in ("iter1", "full-fori", "full"):
        pts_next = pts_prev + d
        final_patch = im.extract_patches_sep(img_next, pts_next, r)
        tpl0 = im.extract_patches_sep(img_prev, pts_prev, r)
        residual = jnp.mean(jnp.abs(final_patch - tpl0), axis=(-2, -1))
        return jnp.sum(pts_next) + jnp.sum(residual)
    return acc


def make_steps(cfg):
    def prefix(pl, pr, cl, cr):
        pl, pr, cl, cr = (x.astype(jnp.float32) for x in (pl, pr, cl, cr))
        f, s, v0 = im.detect_features_grid(
            pl, max_features=cfg.max_features, quality_level=cfg.detect_quality
        )
        f2, _, v1 = fe.match_stereo(pl, pr, f, v0, cfg.matcher)
        return pl, cl, f, v1

    def s_base(pl, pr, cl, cr, key):
        pl_, cl_, f, v1 = prefix(pl, pr, cl, cr)
        return jnp.sum(f) + jnp.sum(v1)

    steps = [("base (detect+match)", s_base)]
    for mode in ("pyr", "template", "tiles", "iter1", "full-fori", "full"):
        def s(pl, pr, cl, cr, key, mode=mode):
            pl_, cl_, f, v1 = prefix(pl, pr, cl, cr)
            return jnp.sum(klt_truncated(pl_, cl_, f, v1, cfg.klt, mode))

        steps.append((f"+ klt[{mode}]", s))
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
    base = None
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
        if base is None:
            base = per
        results[name] = {"ms_per_frame": per, "klt_part_ms": per - base}
        print(f"  {name:24s} {per:8.3f} ms/frame   (klt part {per - base:7.3f})",
              flush=True)

    out = REPO / "benchmarks" / "klt_internals.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
