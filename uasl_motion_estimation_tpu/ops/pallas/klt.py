"""Pallas TPU kernel: one fused pyramidal-KLT level.

The XLA formulation of a KLT level is ~150 small device ops (weight builds,
two sampling matmuls and a 2x2 solve per iteration, times ``iters``), each
with fixed launch overhead — 22 ms/frame of the stereo pipeline's budget on
TPU v5e. This kernel runs the WHOLE level per feature inside VMEM:

  1. DMA the template tile (prev image) and the search tile (next image),
     one aligned block copy each;
  2. build the sub-pixel 13x13 template via separable tent-weight matmuls,
     take Scharr gradients on its interior (bilinear sampling and Scharr are
     both LSI, so sample-then-filter == filter-then-sample on the interior);
  3. precompute the inverse-compositional 2x2 structure tensor;
  4. run all LK iterations in registers: sample the 11x11 window from the
     search tile (two tent matmuls on the MXU), two gradient reductions,
     2x2 solve, clamped displacement update.

Replaces the per-iteration global bilinear gathers of the XLA path
(models/frontend.py klt_track); the front-end itself is new scope — the
reference delegates tracking to its consumers (SURVEY.md TL;DR).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8
_LANE = 128
_PW = 256  # tile width covering lane alignment + window for both tiles


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tent(off, rows: int, cols: int):
    """(rows, cols) separable bilinear weights: W[i, s] = tent(off + i - s)."""
    # Mosaic iota must be integer-typed; subtract in int then convert
    d = (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
         - jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1))
    return jnp.maximum(0.0, 1.0 - jnp.abs(off + d.astype(jnp.float32)))


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _sample(tile, qx, qy, k: int):
    """(k, k) bilinear window of ``tile`` at float top-left (qx, qy)."""
    ph, pw = tile.shape
    wy = _tent(qy, k, ph)
    wx = _tent(qx, k, pw)
    return _dot(_dot(wy, tile), wx.T)


def _klt_kernel(anchors_ref, floats_ref, ip_ref, inx_ref, out_ref,
                tile_p, tile_n, sems, *, block: int, r: int, iters: int,
                margin: int, pad_hp: int, pad_hn: int):
    step = pl.program_id(0)
    k = 2 * r + 1

    def copy(i, which):
        f = step * block + i
        if which == 0:
            x0 = pl.multiple_of(anchors_ref[f, 0], _LANE)
            y0 = pl.multiple_of(anchors_ref[f, 1], _SUB)
            return pltpu.make_async_copy(
                ip_ref.at[pl.ds(y0, pad_hp), pl.ds(x0, _PW)],
                tile_p.at[i], sems.at[0, i])
        x0 = pl.multiple_of(anchors_ref[f, 2], _LANE)
        y0 = pl.multiple_of(anchors_ref[f, 3], _SUB)
        return pltpu.make_async_copy(
            inx_ref.at[pl.ds(y0, pad_hn), pl.ds(x0, _PW)],
            tile_n.at[i], sems.at[1, i])

    for i in range(block):
        copy(i, 0).start()
        copy(i, 1).start()

    for i in range(block):
        copy(i, 0).wait()
        copy(i, 1).wait()

        offp_x = floats_ref[i, 0]
        offp_y = floats_ref[i, 1]
        qb_x = floats_ref[i, 2]
        qb_y = floats_ref[i, 3]
        d0_x = floats_ref[i, 4]
        d0_y = floats_ref[i, 5]
        lo_x = floats_ref[i, 6]
        lo_y = floats_ref[i, 7]

        # sub-pixel (k+2)x(k+2) template (window + 1px gradient support)
        t13 = _sample(tile_p[i], offp_x, offp_y, k + 2)
        tpl = t13[1:k + 1, 1:k + 1]
        # Scharr on the interior (smooth [3,10,3]/16, diff [-1,0,1]/2)
        sy = (3.0 * t13[0:k] + 10.0 * t13[1:k + 1] + 3.0 * t13[2:k + 2]) / 16.0
        gx = (sy[:, 2:k + 2] - sy[:, 0:k]) * 0.5
        sx = (3.0 * t13[:, 0:k] + 10.0 * t13[:, 1:k + 1]
              + 3.0 * t13[:, 2:k + 2]) / 16.0
        gy = (sx[2:k + 2, :] - sx[0:k, :]) * 0.5

        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        tr = a11 + a22
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

        hi_x = lo_x + 2.0 * margin
        hi_y = lo_y + 2.0 * margin
        dx0 = jnp.clip(d0_x, lo_x, hi_x)
        dy0 = jnp.clip(d0_y, lo_y, hi_y)

        def body(_, dcur):
            dx, dy = dcur
            patch = _sample(tile_n[i], qb_x + dx, qb_y + dy, k)
            err = patch - tpl
            b1 = jnp.sum(err * gx)
            b2 = jnp.sum(err * gy)
            ux = -(a22 * b1 - a12 * b2) * inv_det
            uy = -(a11 * b2 - a12 * b1) * inv_det
            ok = jnp.isfinite(ux) & jnp.isfinite(uy)
            dx = jnp.clip(jnp.where(ok, dx + ux, dx), lo_x, hi_x)
            dy = jnp.clip(jnp.where(ok, dy + uy, dy), lo_y, hi_y)
            return dx, dy

        dx, dy = jax.lax.fori_loop(0, iters, body, (dx0, dy0))
        out_ref[i, 0] = dx
        out_ref[i, 1] = dy
        out_ref[i, 2] = min_eig
        out_ref[i, 3] = 0.0


@functools.partial(jax.jit, static_argnames=("r", "iters", "margin", "block",
                                             "interpret"))
def klt_level(img_prev: jax.Array, img_next: jax.Array, pts: jax.Array,
              d0: jax.Array, r: int, iters: int, margin: int,
              block: int = 8, interpret: bool = False
              ) -> tuple[jax.Array, jax.Array]:
    """One KLT level for all features: returns (d_new (N, 2), min_eig (N,)).

    ``pts`` are feature locations in THIS level's pixel coordinates; ``d0``
    the incoming displacement estimate. Displacements are clamped to
    ``margin`` px around the incoming estimate (the coarser levels absorb
    large motion).
    """
    h, w = img_prev.shape
    n = pts.shape[0]
    k = 2 * r + 1
    # The fixed _PW-wide tile must hold the lane-alignment residual (up to
    # _LANE-1 px) plus the widest sampled window; a silent overflow would
    # zero the tent weights and produce garbage tracks.
    need = _LANE - 1 + max(k + 3, k + 2 * margin + 2)
    if need > _PW:
        raise ValueError(
            f"window_radius={r} / margin={margin} need {need} px of tile "
            f"width but the kernel tile is {_PW}; shrink the window or "
            f"margin (or use the XLA path, KLTConfig(fused=False))"
        )
    pad_hp = _round_up(_SUB - 1 + k + 3, _SUB)  # k+2 window + bilinear tap
    s_n = k + 2 * margin + 1
    pad_hn = _round_up(_SUB - 1 + s_n + 1, _SUB)
    lead_y = _round_up(max(k + 3, s_n + 1), _SUB)
    lead_x = _LANE

    def padim(im2, ph):
        return jnp.pad(
            im2,
            ((lead_y, _round_up(h, _SUB) - h + ph),
             (lead_x, _round_up(w, _LANE) - w + _PW)),
            mode="edge",
        )

    ip_p = padim(img_prev, pad_hp)
    inx_p = padim(img_next, pad_hn)
    hp_img, wp_img = ip_p.shape
    hn_img, _ = inx_p.shape

    px, py = pts[:, 0], pts[:, 1]
    # template tile: (k+2)x(k+2) block centered on pts, +1 for bilinear
    tx = jnp.floor(px).astype(jnp.int32) - (r + 1) + lead_x
    ty = jnp.floor(py).astype(jnp.int32) - (r + 1) + lead_y
    ax_p = jnp.clip((tx // _LANE) * _LANE, 0, wp_img - _PW)
    ay_p = jnp.clip((ty // _SUB) * _SUB, 0, hp_img - pad_hp)
    offp = jnp.stack([px - (r + 1) + lead_x - ax_p,
                      py - (r + 1) + lead_y - ay_p], -1)
    offp = jnp.clip(offp, 0.0, None)

    # search tile around the incoming guess
    nx = jnp.floor(px + d0[:, 0]).astype(jnp.int32) - (r + margin) + lead_x
    ny = jnp.floor(py + d0[:, 1]).astype(jnp.int32) - (r + margin) + lead_y
    ax_n = jnp.clip((nx // _LANE) * _LANE, 0, wp_img - _PW)
    ay_n = jnp.clip((ny // _SUB) * _SUB, 0, hn_img - pad_hn)
    qbase = jnp.stack([px - r + lead_x - ax_n.astype(jnp.float32),
                       py - r + lead_y - ay_n.astype(jnp.float32)], -1)
    # displacement clamp: margin px around the incoming integer guess
    lo = jnp.stack([jnp.floor(px + d0[:, 0]) - margin - px,
                    jnp.floor(py + d0[:, 1]) - margin - py], -1)

    anchors = jnp.concatenate(
        [jnp.stack([ax_p, ay_p], -1), jnp.stack([ax_n, ay_n], -1)], -1
    ).astype(jnp.int32)
    floats = jnp.concatenate([offp, qbase, d0, lo], -1).astype(jnp.float32)

    n_pad = _round_up(max(n, block), block)
    if n_pad != n:
        anchors = jnp.pad(anchors, ((0, n_pad - n), (0, 0)))
        floats = jnp.pad(floats, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_klt_kernel, block=block, r=r, iters=iters,
                          margin=margin, pad_hp=pad_hp, pad_hn=pad_hn),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // block,),
            in_specs=[
                pl.BlockSpec((block, 8), lambda i, a_ref: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((block, 4), lambda i, a_ref: (i, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((block, pad_hp, _PW), jnp.float32),
                pltpu.VMEM((block, pad_hn, _PW), jnp.float32),
                pltpu.SemaphoreType.DMA((2, block)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
    )(anchors, floats, ip_p, inx_p)
    return out[:n, :2], out[:n, 2]
