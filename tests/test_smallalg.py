"""Batched small-matrix decompositions (ops/smallalg.py) vs the XLA
custom-call versions they replace: reconstruction, orthogonality, ordering,
and the rank-2 essential case the VO solvers rely on."""

import jax
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.ops import smallalg as sa

RNG = np.random.default_rng(3)


class TestEighJacobi:
    def _check(self, n, b, sweeps=6, tol=1e-4):
        A = RNG.normal(size=(b, n, n)).astype(np.float32)
        A = A @ np.swapaxes(A, 1, 2)
        w, V = jax.jit(lambda x: sa.eigh_jacobi(x, sweeps=sweeps))(
            jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        scale = np.abs(A).max()
        rec = np.einsum("bij,bj,bkj->bik", V, w, V)
        assert np.max(np.abs(rec - A)) < tol * scale
        # ascending eigenvalues match LAPACK
        w_ref = np.linalg.eigvalsh(A)
        assert np.max(np.abs(w - w_ref)) < tol * scale
        # orthonormal V
        I = np.einsum("bij,bik->bjk", V, V)
        assert np.max(np.abs(I - np.eye(n))) < 1e-4

    def test_sizes(self):
        for n, b in ((3, 64), (4, 128), (9, 32), (10, 16)):
            self._check(n, b)

    def test_round_robin_covers_all_pairs(self):
        for n in (3, 4, 9, 10):
            seen = set()
            for rnd in sa._round_robin_rounds(n):
                ps = [p for pair in rnd for p in pair]
                assert len(ps) == len(set(ps))  # disjoint within a round
                seen.update(rnd)
            assert seen == {(p, q) for p in range(n)
                            for q in range(p + 1, n)}


class TestSVD3:
    def test_reconstruction_full_rank(self):
        E = RNG.normal(size=(128, 3, 3)).astype(np.float32)
        U, s, Vt = jax.jit(sa.svd3_rotation)(jnp.asarray(E))
        U, s, Vt = map(np.asarray, (U, s, Vt))
        rec = np.einsum("bij,bj,bjk->bik", U, s, Vt)
        assert np.max(np.abs(rec - E)) < 1e-3 * np.abs(E).max()
        s_ref = np.linalg.svd(E, compute_uv=False)
        assert np.max(np.abs(s - s_ref)) < 1e-3 * s_ref.max()
        # descending order, orthonormal factors
        assert (np.diff(s, axis=-1) <= 1e-5).all()
        assert np.max(np.abs(np.einsum("bij,bik->bjk", U, U)
                             - np.eye(3))) < 1e-4

    def test_rank2_essential_case(self):
        E = RNG.normal(size=(64, 3, 3)).astype(np.float32)
        Ur, sr, Vtr = np.linalg.svd(E)
        sr[:, 2] = 0.0
        sr[:, 0] = sr[:, 1] = 1.0
        E2 = np.einsum("bij,bj,bjk->bik", Ur, sr, Vtr).astype(np.float32)
        U, s, Vt = jax.jit(sa.svd3_rotation)(jnp.asarray(E2))
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                        np.asarray(Vt))
        assert np.max(np.abs(rec - E2)) < 2e-3
        assert np.max(np.abs(np.asarray(s)[:, 2])) < 1e-3
