"""Track-table lifecycle tests: births, deaths, window eviction, slot
recycling — the masked-array equivalent of WBA_Point deque semantics
(feature_types.h:122-197)."""

import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.models import tracks as tr


def uv(val):
    return jnp.full((4,), float(val), jnp.float32)


def mk_new(vals, capacity=None):
    k = len(vals)
    arr = jnp.stack([uv(v) for v in vals]) if k else jnp.zeros((0, 4))
    return arr, jnp.ones(k, bool)


class TestTrackTable:
    def test_birth_and_growth(self):
        t = tr.empty_table(4, 3)
        new, ok = mk_new([10, 20])
        t = tr.advance(t, jnp.zeros((4, 4)), jnp.zeros(4, bool), new, ok)
        assert int(jnp.sum(t.active)) == 2
        assert set(np.asarray(t.track_id[t.active]).tolist()) == {0, 1}
        np.testing.assert_array_equal(np.asarray(tr.track_lengths(t)[t.active]),
                                      [1, 1])
        # newest obs sits at the last window slot
        last_uv, last_ok = tr.latest_uv(t)
        assert bool(jnp.all(last_ok[t.active]))

    def test_tracking_extends_window(self):
        t = tr.empty_table(4, 3)
        new, ok = mk_new([10, 20])
        t = tr.advance(t, jnp.zeros((4, 4)), jnp.zeros(4, bool), new, ok)
        # frame 2: both tracked
        tracked = jnp.tile(uv(11), (4, 1))
        t = tr.advance(t, tracked, t.active, *mk_new([]))
        lengths = np.asarray(tr.track_lengths(t))
        assert sorted(lengths[np.asarray(t.active)].tolist()) == [2, 2]

    def test_window_eviction(self):
        t = tr.empty_table(2, 3)
        t = tr.advance(t, jnp.zeros((2, 4)), jnp.zeros(2, bool), *mk_new([1]))
        for v in [2, 3, 4, 5]:
            t = tr.advance(t, jnp.tile(uv(v), (2, 1)), t.active, *mk_new([]))
        # window holds only the last 3 observations: 3, 4, 5
        slot = int(np.asarray(jnp.argmax(t.active)))
        assert np.asarray(tr.track_lengths(t))[slot] == 3
        np.testing.assert_array_equal(np.asarray(t.uv[slot, :, 0]), [3, 4, 5])

    def test_death_and_recycling(self):
        t = tr.empty_table(2, 3)
        t = tr.advance(t, jnp.zeros((2, 4)), jnp.zeros(2, bool), *mk_new([1, 2]))
        ids0 = np.asarray(t.track_id).copy()
        # track in slot 0 dies; a new detection must recycle its slot
        ok = t.active & (jnp.arange(2) != 0)
        t = tr.advance(t, jnp.tile(uv(9), (2, 1)), ok, *mk_new([7]))
        assert int(jnp.sum(t.active)) == 2
        ids1 = np.asarray(t.track_id)
        assert ids1[0] == 2  # fresh id in the recycled slot
        assert ids1[1] == ids0[1]  # survivor keeps its id
        assert np.asarray(tr.track_lengths(t)).tolist() == [1, 2]

    def test_capacity_overflow_drops_extras(self):
        t = tr.empty_table(2, 3)
        new = jnp.stack([uv(1), uv(2), uv(3)])
        t = tr.advance(t, jnp.zeros((2, 4)), jnp.zeros(2, bool), new,
                       jnp.ones(3, bool))
        assert int(jnp.sum(t.active)) == 2  # third detection dropped
        assert int(t.next_id) == 3  # ids still advance monotonically

    def test_ba_window_view(self):
        t = tr.empty_table(3, 4)
        t = tr.advance(t, jnp.zeros((3, 4)), jnp.zeros(3, bool), *mk_new([1, 2]))
        t = tr.advance(t, jnp.tile(uv(5), (3, 1)), t.active, *mk_new([8]))
        obs, mask = tr.ba_window_view(t, min_obs=2)
        assert obs.shape == (4, 3, 4)
        # only the two 2-obs tracks are kept
        assert int(jnp.sum(jnp.any(mask, axis=0))) == 2
