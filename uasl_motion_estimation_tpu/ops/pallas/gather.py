"""Pallas TPU kernel: batched rectangular patch gather via aligned DMA.

XLA lowers feature-patch extraction (`img[rows[:, :, None], cols[:, None, :]]`)
to an element-wise gather that runs at ~60M elements/s on TPU v5e — 13 ms per
frame for the ZNCC strips alone. But each feature's patch is a CONTIGUOUS 2-D
block of the image, which the DMA engines copy natively.

Mosaic requires DMA slices to respect the (8, 128) f32 tiling, so the kernel
copies the enclosing ALIGNED rectangle per feature (start rounded down to the
tile grid); the residual (sub-tile) offset is applied afterwards by the caller
with separable one-hot/tent-weight matmuls (ops/image.py sample_tiles) — MXU
work, no gathers anywhere.

Used by the front-end for ZNCC strips (ops/stereo.py) and KLT tiles
(ops/image.py); no reference counterpart (the reference's cv::Mat ROI views
are zero-cost on CPU, e.g. mutual_information.cpp:136-140 — on TPU the gather
IS the cost, so it gets the kernel treatment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # f32 sublane tile
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gather_kernel(anchors_ref, img_ref, out_ref, sems, *, block: int,
                   pad_h: int, pad_w: int):
    """Grid step: DMA ``block`` aligned (pad_h, pad_w) rectangles from the
    HBM image into the VMEM output block, all copies in flight together."""
    step = pl.program_id(0)

    def copy(i):
        f = step * block + i
        # the caller aligns anchors to the (8, 128) tile grid; the hint lets
        # Mosaic prove the slice is tiling-aligned
        x0 = pl.multiple_of(anchors_ref[f, 0], _LANE)
        y0 = pl.multiple_of(anchors_ref[f, 1], _SUB)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, pad_h), pl.ds(x0, pad_w)],
            out_ref.at[i],
            sems.at[i],
        )

    for i in range(block):
        copy(i).start()
    for i in range(block):
        copy(i).wait()


@functools.partial(jax.jit, static_argnames=("pad_h", "pad_w", "block",
                                             "interpret"))
def _gather_aligned(img: jax.Array, anchors: jax.Array, pad_h: int,
                    pad_w: int, block: int, interpret: bool) -> jax.Array:
    n = anchors.shape[0]
    n_pad = _round_up(n, block)
    if n_pad != n:
        anchors = jnp.pad(anchors, ((0, n_pad - n), (0, 0)))

    return pl.pallas_call(
        functools.partial(_gather_kernel, block=block, pad_h=pad_h,
                          pad_w=pad_w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // block,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (block, pad_h, pad_w),
                lambda i, anchors_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((block,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, pad_h, pad_w), img.dtype),
        interpret=interpret,
    )(anchors, img)[:n]


def pallas_gather_supported() -> bool:
    from .support import tpu_kernels_supported

    return tpu_kernels_supported()


def _gather_rects_2d(img, anchors, tile_h: int, tile_w: int, block: int,
                     interpret: bool):
    from ..image import sample_tiles

    h, w = img.shape
    pad_h = _round_up(_SUB - 1 + tile_h, _SUB)
    pad_w = _round_up(_LANE - 1 + tile_w, _LANE)
    # leading pad lets anchors go negative (edge-replicated reads, matching
    # extract_tiles semantics); trailing pad admits aligned windows at every
    # clamped anchor
    lead_y = _round_up(tile_h, _SUB)
    lead_x = _round_up(tile_w, _LANE)
    img_p = jnp.pad(
        img,
        ((lead_y, _round_up(h, _SUB) - h + pad_h),
         (lead_x, _round_up(w, _LANE) - w + pad_w)),
        mode="edge",
    )
    x0 = jnp.clip(anchors[:, 0], -tile_w, w - 1) + lead_x
    y0 = jnp.clip(anchors[:, 1], -tile_h, h - 1) + lead_y
    xa = (x0 // _LANE) * _LANE
    ya = (y0 // _SUB) * _SUB
    tiles = _gather_aligned(img_p, jnp.stack([xa, ya], -1), pad_h, pad_w,
                            block, interpret)
    # residual in-tile offset: integer, so the tent weights are one-hot
    offs = jnp.stack([x0 - xa, y0 - ya], -1).astype(img.dtype)
    return sample_tiles(tiles, offs, tile_h, tile_w)


def gather_rects(img: jax.Array, anchors: jax.Array, tile_h: int,
                 tile_w: int, block: int = 16,
                 interpret: bool | None = None) -> jax.Array:
    """(..., N, tile_h, tile_w) rectangles of ``img`` (..., H, W) with integer
    top-left corners ``anchors`` (..., N, 2) [x, y], edge-clamped.

    Leading batch dims map over the kernel. ``interpret`` defaults to auto:
    real kernel on TPU, interpreter elsewhere (CPU tests / simulated mesh).
    """
    if interpret is None:
        interpret = not pallas_gather_supported()
    fn = functools.partial(_gather_rects_2d, tile_h=tile_h, tile_w=tile_w,
                           block=block, interpret=interpret)
    for _ in range(img.ndim - 2):
        fn = jax.vmap(fn)
    return fn(img, anchors)
