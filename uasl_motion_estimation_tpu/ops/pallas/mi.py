"""Pallas TPU kernel: batched joint-histogram mutual information.

The jnp formulation of MI (ops/similarity.py) materializes a one-hot tensor
of shape (pairs, pixels, bins) in HBM — for a full MI disparity cost volume
(500 feats x 128 disparities x 121 px x 20 bins) that is ~2.5 GB of traffic
for 64k scalar scores. This kernel keeps everything in VMEM: each grid step
loads a tile of quantized patch pairs, builds the 20x20 joint histogram via
an in-register one-hot compare-and-reduce, applies the marginal/entropy math
with two tiny aggregation matmuls (no awkward reshapes on the lane axis),
and writes only the scores back.

Replaces the scalar double-loop + calcHist of the reference's
``computeMutualInformation`` (src/core/mutual_information.cpp:55-86) at
cost-volume scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BINS = 20  # histSize = 20 (mutual_information.cpp:33, 66)
_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mi_kernel(qa_ref, qb_ref, out_ref, *, bins: int, n_valid: int,
               nb2_pad: int):
    """One tile: (TB, P) int32 quantized pairs -> (TB, LANE) scores
    (score broadcast across the lane axis; caller reads column 0)."""
    qa = qa_ref[:]  # (TB, P)
    qb = qb_ref[:]
    tb, p = qa.shape

    # joint bin index; padded pixels carry a sentinel >= nb2_pad and fall
    # outside every histogram slot
    j = qa * bins + qb  # (TB, P)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, p, nb2_pad), 2)
    onehot = (j[:, :, None] == k_iota).astype(jnp.float32)  # (TB, P, NB2)
    hist = jnp.sum(onehot, axis=1)  # (TB, NB2)
    pj = hist / float(n_valid)

    # marginals via aggregation matmuls: A_row[k, i] = [k // bins == i],
    # A_col[k, i] = [k % bins == i] for k < bins*bins (bins_pad wide to stay
    # lane-aligned; the padded columns are all-zero)
    bins_pad = _LANE
    k1 = jax.lax.broadcasted_iota(jnp.int32, (nb2_pad, bins_pad), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (nb2_pad, bins_pad), 1)
    in_range = k1 < bins * bins
    a_row = ((k1 // bins == i1) & in_range).astype(jnp.float32)
    a_col = ((k1 % bins == i1) & in_range).astype(jnp.float32)

    pa = jnp.dot(pj, a_row, preferred_element_type=jnp.float32)  # (TB, BP)
    pb = jnp.dot(pj, a_col, preferred_element_type=jnp.float32)
    # broadcast marginals back onto the joint axis
    pa_full = jnp.dot(pa, a_row.T, preferred_element_type=jnp.float32)
    pb_full = jnp.dot(pb, a_col.T, preferred_element_type=jnp.float32)

    denom = pa_full * pb_full
    valid = (pj > 0.0) & (denom > 0.0)
    ratio = jnp.where(valid, pj / jnp.where(valid, denom, 1.0), 1.0)
    mi = jnp.sum(jnp.where(valid, pj * (jnp.log2(ratio)), 0.0), axis=-1)

    out_ref[:] = jnp.broadcast_to(mi[:, None], (tb, _LANE))


@functools.partial(
    jax.jit, static_argnames=("n_valid", "bins", "interpret", "tile")
)
def mi_quantized_pairs(
    qa: jax.Array,
    qb: jax.Array,
    n_valid: int | None = None,
    bins: int = DEFAULT_BINS,
    interpret: bool = False,
    tile: int = 8,
) -> jax.Array:
    """(B,) MI in bits for B pairs of quantized patches (B, P) int32.

    P must be lane-padded (multiple of 128) with sentinel values >= bins in
    the padding; ``n_valid`` is the real pixel count (defaults to P).
    """
    b, p = qa.shape
    assert p % _LANE == 0, f"pad the pixel axis to a multiple of {_LANE}"
    n_valid = p if n_valid is None else n_valid
    nb2_pad = _ceil_to(bins * bins, _LANE)

    b_pad = _ceil_to(b, tile)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        qa = jnp.pad(qa, pad, constant_values=bins * bins)
        qb = jnp.pad(qb, pad, constant_values=0)

    out = pl.pallas_call(
        functools.partial(_mi_kernel, bins=bins, n_valid=n_valid,
                          nb2_pad=nb2_pad),
        out_shape=jax.ShapeDtypeStruct((b_pad, _LANE), jnp.float32),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qa.astype(jnp.int32), qb.astype(jnp.int32))
    return out[:b, 0]


def pallas_supported() -> bool:
    """True when the default backend can run (non-interpreted) TPU kernels."""
    from .support import tpu_kernels_supported

    return tpu_kernels_supported()


def mutual_information_pallas(
    patches_a: jax.Array,
    patches_b: jax.Array,
    bins: int = DEFAULT_BINS,
    vmax: float = 256.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for ops.similarity.mutual_information on batched float
    patches (..., H, W) — quantizes, lane-pads, and runs the VMEM kernel.

    ``interpret`` defaults to auto: real kernel on TPU, interpreter on CPU
    (tests / the simulated mesh).
    """
    if interpret is None:
        interpret = not pallas_supported()
    shape = patches_a.shape
    assert patches_b.shape == shape
    npix = shape[-2] * shape[-1]
    flat_a = patches_a.reshape(-1, npix)
    flat_b = patches_b.reshape(-1, npix)

    qa = jnp.clip(
        jnp.floor(flat_a.astype(jnp.float32) * (bins / vmax)), 0, bins - 1
    ).astype(jnp.int32)
    qb = jnp.clip(
        jnp.floor(flat_b.astype(jnp.float32) * (bins / vmax)), 0, bins - 1
    ).astype(jnp.int32)

    p_pad = _ceil_to(npix, _LANE)
    if p_pad != npix:
        qa = jnp.pad(qa, ((0, 0), (0, p_pad - npix)),
                     constant_values=bins * bins)  # sentinel: no slot matches
        qb = jnp.pad(qb, ((0, 0), (0, p_pad - npix)), constant_values=0)

    mi = mi_quantized_pairs(qa, qb, n_valid=npix, bins=bins,
                            interpret=interpret)
    return mi.reshape(shape[:-2])
