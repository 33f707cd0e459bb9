"""Offline install-policy explorer over dumped unified-engine outputs.

Loads benchmarks/unified_dump_stride{S}.npz (written by diag_unified_age)
and evaluates composed-ATE under candidate per-motion install policies
WITHOUT re-running the TPU. Debug tool for the round-4 unified engine; the
chosen policy must then be re-validated on a different world seed before it
ships (no tuning-on-the-benchmark).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from uasl_motion_estimation_tpu.models.smoother import unified_window_starts

W = 5
N_FRAMES = 40


def chain_ate(motions, gt_poses):
    n = motions.shape[0] + 1
    traj = np.empty((n, 4, 4))
    traj[0] = np.eye(4)
    for i in range(motions.shape[0]):
        traj[i + 1] = traj[i] @ np.linalg.inv(motions[i])
    p = traj[:, :3, 3]
    g = gt_poses[:n, :3, 3]
    pc = p - p.mean(0)
    gc = g - g.mean(0)
    # align yaw-free: simple umeyama-free ATE as used in metrics.ate_rmse
    # (rotation+translation alignment)
    H = pc.T @ gc
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1, 1, d]) @ U.T
    aligned = (R @ pc.T).T + g.mean(0)
    return float(np.sqrt(np.mean(np.sum((aligned - g) ** 2, axis=1))))


def motion_discrepancy(a, b, depth=15.0):
    dt = np.linalg.norm(a[:3, 3] - b[:3, 3])
    Rr = a[:3, :3].T @ b[:3, :3]
    ang = np.arccos(np.clip((np.trace(Rr) - 1) / 2, -1, 1))
    return dt + depth * ang  # meters-equivalent at `depth` m


def evaluate(stride, policies, seed=0):
    d = np.load(REPO / f"benchmarks/unified_dump_stride{stride}_s{seed}.npz")
    starts = unified_window_starts(N_FRAMES, W, stride)
    b = N_FRAMES - 1
    gt = d["gt_poses"]
    vo_m, ref = d["vo_motions"].astype(np.float64), d["refined"].astype(np.float64)
    nfo, ninl = d["nfo"], d["vo_n_inliers"]

    # candidates per motion: list of (i, j)
    cand = {m: [] for m in range(b)}
    for i, s in enumerate(starts):
        for j in range(W - 1):
            if s + j < b:
                cand[s + j].append((i, j))

    def compose(policy):
        mv = np.tile(np.eye(4), (b, 1, 1))
        mb = np.tile(np.eye(4), (b, 1, 1))
        for m, cs in cand.items():
            vi, vj = policy["vo_pick"](cs, ninl, nfo)
            mv[m] = vo_m[vi, vj]
            pick = policy["ba_pick"](cs, nfo, ninl, vo_m, ref, (vi, vj))
            mb[m] = ref[pick[0], pick[1]] if pick else mv[m]
        return chain_ate(mv, gt), chain_ate(mb, gt)

    print(f"--- stride {stride} seed {seed} ---")
    for name, pol in policies.items():
        av, ab = compose(pol)
        tag = " PASS" if ab < av else ""
        print(f"{name:44s} ate_vo={av:.4f} ate_ba={ab:.4f}{tag}")


def vo_min_age(cs, ninl, nfo):
    return min(cs, key=lambda c: c[1])


def vo_max_inl(cs, ninl, nfo):
    return max(cs, key=lambda c: (ninl[c], -c[1]))


def ba_gate(thresh, agemax=99, disc=None, vo_required=False):
    def pick(cs, nfo, ninl, vo_m, ref, vo_pick):
        best = None
        for (i, j) in sorted(cs, key=lambda c: -min(nfo[c[0], c[1]],
                                                    nfo[c[0], c[1] + 1])):
            if j > agemax:
                continue
            if min(nfo[i, j], nfo[i, j + 1]) < thresh:
                continue
            if disc is not None:
                dd = motion_discrepancy(ref[i, j], vo_m[vo_pick[0], vo_pick[1]])
                if dd > disc:
                    continue
            best = (i, j)
            break
        return best
    return pick


def main():
    import itertools
    for stride, seed in itertools.product((4, 2), range(6)):
        if not (REPO / f"benchmarks/unified_dump_stride{stride}_s{seed}.npz").exists():
            continue
        policies = {
            "min-age + gate15 (current)": dict(
                vo_pick=vo_min_age, ba_pick=ba_gate(15)),
            "min-age + gate25": dict(vo_pick=vo_min_age, ba_pick=ba_gate(25)),
            "min-age + gate30": dict(vo_pick=vo_min_age, ba_pick=ba_gate(30)),
            "min-age + gate40": dict(vo_pick=vo_min_age, ba_pick=ba_gate(40)),
            "min-age + gate50": dict(vo_pick=vo_min_age, ba_pick=ba_gate(50)),
            "max-inl + gate15": dict(vo_pick=vo_max_inl, ba_pick=ba_gate(15)),
            "max-inl + gate25": dict(vo_pick=vo_max_inl, ba_pick=ba_gate(25)),
            "max-inl + gate30": dict(vo_pick=vo_max_inl, ba_pick=ba_gate(30)),
            "max-inl + gate40": dict(vo_pick=vo_max_inl, ba_pick=ba_gate(40)),
            "max-inl + gate15 + disc50mm": dict(
                vo_pick=vo_max_inl, ba_pick=ba_gate(15, disc=0.05)),
            "max-inl + gate15 + disc30mm": dict(
                vo_pick=vo_max_inl, ba_pick=ba_gate(15, disc=0.03)),
            "max-inl + gate25 + disc50mm": dict(
                vo_pick=vo_max_inl, ba_pick=ba_gate(25, disc=0.05)),
            "max-inl + gate15 + age<=2": dict(
                vo_pick=vo_max_inl, ba_pick=ba_gate(15, agemax=2)),
            "max-inl + gate25 + age<=2": dict(
                vo_pick=vo_max_inl, ba_pick=ba_gate(25, agemax=2)),
        }
        evaluate(stride, policies, seed)


if __name__ == "__main__":
    main()
