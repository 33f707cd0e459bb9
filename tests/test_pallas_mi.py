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

    def test_router_broadcasts_like_jnp(self):
        """mutual_information_batched must broadcast a (N,1,k,k) x (N,D,k,k)
        cost-volume pairing exactly like the jnp path (the match_stereo MI
        call shape)."""
        a = jnp.asarray(RNG.uniform(0, 255, (6, 1, 9, 9)), jnp.float32)
        b = jnp.asarray(RNG.uniform(0, 255, (6, 5, 9, 9)), jnp.float32)
        got = sim.mutual_information_batched(a, b, use_pallas=True)
        want = sim.mutual_information_batched(a, b, use_pallas=False)
        assert got.shape == (6, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_mi_matcher_parity_kernel_vs_jnp(self):
        """The production MI matcher must return identical matches whichever
        MI backend scores it (VERDICT r4 item 3: kernel wired in-path)."""
        from uasl_motion_estimation_tpu.models import frontend as fe
        from uasl_motion_estimation_tpu.ops import image as im
        from tests.test_frontend import shift_image, textured_scene

        right = textured_scene()
        left = shift_image(right, 11.0, 0)
        right_inv = 255.0 - right
        xy, _, valid = im.detect_features(jnp.asarray(left), max_features=32)
        out = {}
        for use_pallas in (False, True):
            cfg = fe.MatcherConfig(max_disparity=32, use_pallas=use_pallas)
            fr, sc, v = fe.match_stereo(
                jnp.asarray(left), jnp.asarray(right_inv), xy, valid, cfg,
                use_mi=True,
            )
            out[use_pallas] = (np.asarray(fr), np.asarray(sc), np.asarray(v))
        np.testing.assert_array_equal(out[False][2], out[True][2])
        np.testing.assert_allclose(out[False][1], out[True][1], atol=1e-4)
        np.testing.assert_allclose(out[False][0], out[True][0], atol=1e-3)

    def test_sentinel_anywhere_above_bins(self):
        """Regression (review finding): the documented padding contract is
        'sentinel >= bins'; the MXU kernel packs the histogram on 32
        sublanes, so a sentinel in [bins, 32) must still stay out of every
        histogram slot."""
        from uasl_motion_estimation_tpu.ops.pallas.mi import (
            mi_quantized_pairs,
        )

        rng = np.random.default_rng(0)
        npix = 121
        qa = rng.integers(0, 20, (9, npix)).astype(np.int32)
        qb = rng.integers(0, 20, (9, npix)).astype(np.int32)
        pad = 128 - npix
        for sentinel in (20, 25, 31, 400):
            qa_p = np.pad(qa, ((0, 0), (0, pad)), constant_values=sentinel)
            qb_p = np.pad(qb, ((0, 0), (0, pad)), constant_values=0)
            got = np.asarray(mi_quantized_pairs(
                jnp.asarray(qa_p), jnp.asarray(qb_p), n_valid=npix,
                interpret=True))
            want = np.asarray(sim.mutual_information(
                (qa * 256.0 / 20 + 0.5).astype(np.float32).reshape(9, 11, 11),
                (qb * 256.0 / 20 + 0.5).astype(np.float32).reshape(9, 11, 11),
            ))
            np.testing.assert_allclose(got, want, atol=1e-4,
                                       err_msg=f"sentinel={sentinel}")

    def test_batch_shapes(self):
        a = jnp.asarray(RNG.uniform(0, 255, (4, 7, 9, 9)), jnp.float32)
        b = jnp.asarray(RNG.uniform(0, 255, (4, 7, 9, 9)), jnp.float32)
        got = mutual_information_pallas(a, b, interpret=True)
        assert got.shape == (4, 7)
        want = sim.mutual_information(a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
