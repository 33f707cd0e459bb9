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

    def test_equal_diagonal_pair(self):
        """Regression (review finding): sign(tau)=0 at exactly-equal
        diagonal entries skipped the mandatory 45-degree rotation and the
        matrix never diagonalized — e.g. E^T E of an axis-aligned pure
        translation."""
        A = np.array([[0.5, -0.5, 0.0], [-0.5, 0.5, 0.0], [0.0, 0.0, 1.0]],
                     np.float32)[None]
        w, V = sa.eigh_jacobi(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(w)[0], [0.0, 1.0, 1.0],
                                   atol=1e-6)
        rec = np.einsum("bij,bj,bkj->bik", np.asarray(V), np.asarray(w),
                        np.asarray(V))
        np.testing.assert_allclose(rec, A, atol=1e-6)
        # the downstream essential case: svd of skew((1,1,0)/sqrt(2))
        t = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)
        E = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                      [-t[1], t[0], 0]], np.float32)[None]
        U, s, Vt = sa.svd3_rotation(jnp.asarray(E))
        np.testing.assert_allclose(np.asarray(s)[0], [1.0, 1.0, 0.0],
                                   atol=1e-5)
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                        np.asarray(Vt))
        np.testing.assert_allclose(rec, E, atol=1e-4)

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
