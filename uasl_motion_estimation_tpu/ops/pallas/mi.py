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


def _mi_kernel(qa_ref, qb_ref, out_ref, *, bins: int, n_valid: int):
    """One tile: (TB, P) int32 quantized pairs -> (TB, LANE) scores
    (score broadcast across the lane axis; caller reads column 0).

    The joint histogram is a per-pair MXU matmul: two ``bins``-wide one-hot
    stacks (TB, BS, P) contracted over the pixel axis give (TB, BS, BS)
    counts. The first formulation built a flat (TB, P, bins^2) one-hot and
    VPU-reduced it — 65k compare+add ops per pair; this one constructs
    2 x BS x P compares (~8k ops) and hands the reduction to the MXU.
    Measured on v5e at the 64k-pair cost volume (amortized in-jit):
    9.0 -> 4.9 ms/eval vs the old kernel, 2.5x over the jnp one-hot path
    (13.4 vs 5.3 M pairs/s). bf16 one-hots are exact here: counts are
    bounded by P < 256.
    """
    qa = qa_ref[:]  # (TB, P)
    qb = qb_ref[:]
    tb, p = qa.shape
    bs = 32  # bins=20 padded to a sublane multiple; rows/cols >= bins stay 0

    i_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, bs, p), 1)
    # padded pixels carry ANY sentinel >= bins: the explicit < bins mask
    # keeps them out of every histogram row even when the sentinel lands
    # inside the padded sublane range [bins, BS) (review finding — the
    # documented contract is "sentinel >= bins", not ">= BS")
    in_range_a = (qa >= 0) & (qa < bins)
    in_range_b = (qb >= 0) & (qb < bins)
    A = ((qa[:, None, :] == i_iota)
         & in_range_a[:, None, :]).astype(jnp.bfloat16)  # (TB, BS, P)
    B = ((qb[:, None, :] == i_iota)
         & in_range_b[:, None, :]).astype(jnp.bfloat16)
    hist = jax.lax.dot_general(
        A, B, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, BS, BS)
    pj = hist / float(n_valid)

    # keepdims everywhere: Mosaic's layout inference (this libtpu) aborts on
    # rank-changing reshapes of 3-D vectors inside the kernel
    pa = jnp.sum(pj, axis=2, keepdims=True)  # (TB, BS, 1) marginal of a
    pb = jnp.sum(pj, axis=1, keepdims=True)  # (TB, 1, BS) marginal of b
    denom = pa * pb
    valid = (pj > 0.0) & (denom > 0.0)
    ratio = jnp.where(valid, pj / jnp.where(valid, denom, 1.0), 1.0)
    terms = jnp.where(valid, pj * (jnp.log2(ratio)), 0.0)
    mi = jnp.sum(jnp.sum(terms, axis=2, keepdims=True), axis=1)  # (TB, 1)

    out_ref[:] = jnp.broadcast_to(mi, (tb, _LANE))


@functools.partial(
    jax.jit, static_argnames=("n_valid", "bins", "interpret", "tile")
)
def mi_quantized_pairs(
    qa: jax.Array,
    qb: jax.Array,
    n_valid: int | None = None,
    bins: int = DEFAULT_BINS,
    interpret: bool = False,
    tile: int = 128,
) -> jax.Array:
    """(B,) MI in bits for B pairs of quantized patches (B, P) int32.

    P must be lane-padded (multiple of 128) with sentinel values >= bins in
    the padding; ``n_valid`` is the real pixel count (defaults to P).
    ``tile`` default measured on v5e (sweep 8..256 at the 64k-pair
    cost-volume size: flat within 4% from 64 up; 128 balances small-batch
    rounding waste against per-step overhead).
    """
    b, p = qa.shape
    assert p % _LANE == 0, f"pad the pixel axis to a multiple of {_LANE}"
    assert bins <= 32, "kernel packs the histogram on 32 sublanes"
    n_valid = p if n_valid is None else n_valid

    b_pad = _ceil_to(b, tile)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        qa = jnp.pad(qa, pad, constant_values=bins * bins)
        qb = jnp.pad(qb, pad, constant_values=0)

    out = pl.pallas_call(
        functools.partial(_mi_kernel, bins=bins, n_valid=n_valid),
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
