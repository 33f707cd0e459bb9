"""Pallas MI kernel parity tests (interpreter mode on the CPU mesh): the
VMEM joint-histogram kernel must match the jnp one-hot-matmul formulation
bit-for-tolerance."""

import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.ops import similarity as sim
from uasl_motion_estimation_tpu.ops.pallas.mi import mutual_information_pallas

RNG = np.random.default_rng(5)


class TestPallasMI:
    def test_matches_jnp_formulation(self):
        a = jnp.asarray(RNG.uniform(0, 255, (37, 11, 11)), jnp.float32)
        b = jnp.asarray(RNG.uniform(0, 255, (37, 11, 11)), jnp.float32)
        got = mutual_information_pallas(a, b, interpret=True)
        want = sim.mutual_information(a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_identical_patches_give_entropy(self):
        a = jnp.asarray(RNG.uniform(0, 255, (5, 11, 11)), jnp.float32)
        got = mutual_information_pallas(a, a, interpret=True)
        want = sim.entropy(a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_independent_patches_near_zero(self):
        a = jnp.asarray(np.tile(RNG.uniform(0, 255, (1, 16, 16)), (3, 1, 1)),
                        jnp.float32)
        b = jnp.asarray(RNG.uniform(0, 255, (3, 16, 16)), jnp.float32)
        got = np.asarray(mutual_information_pallas(a, b, interpret=True))
        same = np.asarray(mutual_information_pallas(a, a, interpret=True))
        assert (got < 0.5 * same).all()

    def test_batch_shapes(self):
        a = jnp.asarray(RNG.uniform(0, 255, (4, 7, 9, 9)), jnp.float32)
        b = jnp.asarray(RNG.uniform(0, 255, (4, 7, 9, 9)), jnp.float32)
        got = mutual_information_pallas(a, b, interpret=True)
        assert got.shape == (4, 7)
        want = sim.mutual_information(a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
