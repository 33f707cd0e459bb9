"""Sub-stage budget of stereo_vo_solve on the chip (honest forced timing).

Stages: hypothesis sampling, triad+GN hypotheses, (H, N) scoring, final LM
refinement — plus the refinement's actual iteration count distribution.
"""

from __future__ import annotations

import os
import sys
from functools import partial
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
from uasl_motion_estimation_tpu.ops import geometry as geo, lie, pnp
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.solvers.lm import LMConfig, lm_solve
from uasl_motion_estimation_tpu.utils.profiling import force, timeit_forced
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

B = int(os.environ.get("PROF_BATCH", "16"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def main():
    rig = CameraRig()
    seq = SyntheticStereoSequence(n_frames=2, rig=rig, seed=0)
    l0, r0 = seq.frame(0)
    l1, r1 = seq.frame(1)
    cfg = default_config(Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline)
    p = cfg.vo

    qm = jax.jit(lambda a, b, c, d: fe.quad_match_frames(
        a, b, c, d, max_features=cfg.max_features, matcher=cfg.matcher,
        klt=cfg.klt, detector="grid"))
    m = qm(*[jnp.asarray(x, jnp.float32) for x in (l0, r0, l1, r1)])
    muv = jnp.asarray(force(m.uv))
    mvalid = jnp.asarray(force(m.valid))
    key = jax.random.key(0)
    print(f"valid matches: {int(mvalid.sum())}", flush=True)

    def timeb(name, fn, *args):
        bfn = jax.jit(jax.vmap(fn))
        bargs = tuple(jnp.broadcast_to(a, (B,) + a.shape) for a in args)
        t, _ = timeit_forced(bfn, *bargs, reps=REPS)
        print(f"  {name:40s} {t / B * 1e3:8.2f} ms/item (x{B})", flush=True)

    pts3 = geo.triangulate_disparity(muv[:, 0], muv[:, 1], p.intr1, p.intr2,
                                     p.baseline)
    pts3c = geo.triangulate_disparity(muv[:, 2], muv[:, 3], p.intr1, p.intr2,
                                      p.baseline)
    obs = muv[:, 2:4]
    validf = mvalid.astype(muv.dtype)

    # a) sampling
    timeb("sample_hypotheses (gumbel top3 x200)",
          lambda k: sv._sample_hypotheses(k, p.n_ransac, mvalid), key)

    samples = sv._sample_hypotheses(key, p.n_ransac, mvalid)
    samples = jnp.asarray(force(samples))

    # b) hypotheses: triad + 2 GN
    def hyps(smp):
        def run_hyp(idx3):
            Rh, th, ok = pnp.rigid_align_3pt(pts3[idx3], pts3c[idx3])
            seed = jnp.concatenate([lie.R_to_euler(Rh.T), th])
            seed = jnp.where(ok & jnp.all(jnp.isfinite(seed)), seed,
                             jnp.zeros(6, muv.dtype))
            return sv._gn_fixed(seed, pts3[idx3], obs[idx3], validf[idx3], p, 2)
        return jax.vmap(run_hyp)(smp)

    timeb("hypotheses triad+2GN (x200)", hyps, samples)

    def hyps_triad_only(smp):
        def run_hyp(idx3):
            Rh, th, ok = pnp.rigid_align_3pt(pts3[idx3], pts3c[idx3])
            return jnp.concatenate([lie.R_to_euler(Rh.T), th])
        return jax.vmap(run_hyp)(smp)

    timeb("hypotheses triad only (x200)", hyps_triad_only, samples)

    hyp_states = jnp.asarray(force(hyps(samples)))

    # c) scoring
    def scoring(hs):
        errs = jax.vmap(lambda s: sv._sq_reproj_error(s, pts3, obs, p))(hs)
        inl = (errs < p.inlier_threshold**2) & mvalid[None, :]
        return jnp.argmax(jnp.sum(inl, axis=-1))

    timeb("scoring (200 x N reproj)", scoring, hyp_states)

    best = scoring(hyp_states)
    best_state = jnp.asarray(force(hyp_states[best]))
    errs0 = sv._sq_reproj_error(best_state, pts3, obs, p)
    inlier = jnp.asarray(force((errs0 < p.inlier_threshold**2) & mvalid))
    w = inlier.astype(muv.dtype)

    # d) final refinement at several iteration caps
    for cap in (100, 20, 10):
        lmcfg = LMConfig(max_iter=cap, use_lm=p.use_lm, minimize=True,
                         tau=1e-5, abs_tol=p.e1, grad_tol=p.e2,
                         incr_tol=p.e3, rel_tol=p.e4)

        def refine(st):
            r = lm_solve(
                partial(sv._normal_eq, pts3=pts3, obs=obs, weights=w, p=p),
                st, lmcfg,
                cost_fn=partial(sv._cost_only, pts3=pts3, obs=obs, weights=w,
                                p=p))
            return r.x, r.n_iter, r.stop

        timeb(f"refine GN cap={cap}", refine, best_state)

    x, n_iter, stop = jax.jit(refine)(best_state)
    print(f"refine from best hyp: n_iter={int(force(n_iter))} "
          f"stop={int(force(stop))}", flush=True)

    # full solve for reference
    timeb("stereo_vo_solve full",
          lambda mm, vv, kk: sv.stereo_vo_solve(mm, vv, kk, p),
          muv, mvalid, key)


if __name__ == "__main__":
    main()
