"""Pallas GN matcher — the honest attempt at the chained-gather wall.

VERDICT r02 task 3: the whole 3-level 400x400 pyramid is ~210k f32 cells
(~840 KB) — it fits in v5e VMEM, so in principle a single Pallas kernel can
run ALL GN iterations with the table VMEM-resident, paying the HBM read once
instead of leaning on XLA's chained-gather rate (~130M gathered elem/s,
docs/PERF.md).

The catch this kernel exists to MEASURE: Mosaic has no vector gather
(pallas_guide.md lists none; ops/pallas_scatter.py hit the same wall from the
store side).  The 4-neighbor bilinear fetch therefore runs as a PER-BEAM
SCALAR LOOP over dynamically-indexed single-element VMEM loads — a vector
phase computes per-beam cell coordinates/weights on the VPU, writes them to
VMEM scratch, and a fori_loop re-reads them one beam at a time to accumulate
the 11-term GN reduction in scalar carries.  Per full match that is
iterations x beams x 4 serialized loads (15 x 512 x 4 = ~31k at bench scale).

Measured on v5e (scripts/bench_pallas_gn.py; docs/PERF.md table): the scalar
loop loses to XLA's fused gather matcher by a wide margin — the kernel is
kept as the measured refutation (and as the template should Mosaic grow a
vector gather), NOT on any production path.

Matches ops/gn.fused_gn_iteration's math exactly (same [11] reduction, same
scalar adjugate solve; tests/test_pallas_gn.py checks interpret mode vs the
XLA kernel).  Reference contract: ScanMatcher.cs:93-204.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gn import _solve_scalar

LANES = 128


def _matcher_kernel(pose_ref, table_ref, X_ref, Y_ref, V_ref, out_ref,
                    scratch_base, scratch_fx, scratch_fy, scratch_rx,
                    scratch_ry, scratch_m, *, levels, iters_per_level,
                    deriv_clamp, n_rows):
    """levels: tuple of (offset, width, scale); table padded to [Ct//128, 128].

    Scalar phase reads per-beam scratch and accumulates the 11-term reduction
    one beam at a time (see module docstring for why)."""
    pose = (pose_ref[0], pose_ref[1], pose_ref[2])
    n = n_rows * LANES

    for (offset, width, scale), n_iters in zip(levels, iters_per_level):
        ox = jnp.float32(0.0)
        # world -> level pixels
        px = pose[0] * scale + ox
        py = pose[1] * scale + ox
        th = pose[2]
        est = (px, py, th)
        for _ in range(n_iters):
            px, py, th = est
            sr = jnp.sin(th) * scale
            cr = jnp.cos(th) * scale

            # ---- vector phase: coords, weights, masks -> scratch ----------
            Xv = X_ref[:]                       # [n_rows, 128]
            Yv = Y_ref[:]
            Vv = V_ref[:]
            mx = cr * Xv - sr * Yv + px
            my = sr * Xv + cr * Yv + py
            in_b = ((Vv > 0) & (mx >= 0.0) & (mx <= width - 2)
                    & (my >= 0.0) & (my <= width - 2))
            xi = jnp.clip(mx.astype(jnp.int32), 0, width - 2)
            yi = jnp.clip(my.astype(jnp.int32), 0, width - 2)
            scratch_base[:] = jnp.where(in_b, offset + yi * width + xi, 0)
            scratch_fx[:] = mx - xi.astype(jnp.float32)
            scratch_fy[:] = my - yi.astype(jnp.float32)
            scratch_rx[:] = -sr * Xv - cr * Yv     # rot-derivative terms
            scratch_ry[:] = cr * Xv - sr * Yv
            scratch_m[:] = in_b.astype(jnp.float32)

            # ---- scalar phase: per-beam 4-point fetch + accumulate --------
            def body(i, acc):
                r = i // LANES
                c = i % LANES
                base = scratch_base[r, c]
                bq = base // LANES
                br = base % LANES
                b1 = base + 1
                bw = base + width
                bw1 = base + width + 1
                v00 = table_ref[bq, br]
                v01 = table_ref[b1 // LANES, b1 % LANES]
                v10 = table_ref[bw // LANES, bw % LANES]
                v11 = table_ref[bw1 // LANES, bw1 % LANES]
                # sigmoid inline (OccGridMap probability)
                v00 = 1.0 / (1.0 + jnp.exp(-v00))
                v01 = 1.0 / (1.0 + jnp.exp(-v01))
                v10 = 1.0 / (1.0 + jnp.exp(-v10))
                v11 = 1.0 / (1.0 + jnp.exp(-v11))
                fx = scratch_fx[r, c]
                fy = scratch_fy[r, c]
                m = scratch_m[r, c]
                xf = 1.0 - fx
                yf = 1.0 - fy
                val = (v00 * xf + v01 * fx) * yf + (v10 * xf + v11 * fx) * fy
                gx = -((v00 - v01) * xf + (v10 - v11) * fx) * m
                gy = -((v00 - v10) * yf + (v01 - v11) * fy) * m
                fun = (1.0 - val) * m
                rot = scratch_rx[r, c] * gx + scratch_ry[r, c] * gy
                return (acc[0] + gx * fun, acc[1] + gy * fun,
                        acc[2] + rot * fun,
                        acc[3] + gx * gx, acc[4] + gx * gy,
                        acc[5] + gx * rot, acc[6] + gy * gy,
                        acc[7] + gy * rot, acc[8] + rot * rot)

            z = jnp.float32(0.0)
            acc = jax.lax.fori_loop(0, n, body, (z,) * 9)
            d0, d1, d2, H00, H01, H02, H11, H12, H22 = acc
            s0, s1, s2, _ = _solve_scalar(H00, H01, H02, H11, H12, H22,
                                          d0, d1, d2, deriv_clamp, 0.0)
            est = (px + s0, py + s1, th + s2)

        # back to world for the next (finer) level
        px, py, th = est
        pose = (px / scale, py / scale, th)

    out_ref[0] = pose[0]
    out_ref[1] = pose[1]
    out_ref[2] = pose[2]


def match_pallas(table: jnp.ndarray, cfg, pose_world: jnp.ndarray,
                 X: jnp.ndarray, Y: jnp.ndarray, valid: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Full coarse-to-fine match in ONE kernel, table VMEM-resident.

    table: concatenated pyramid f32[total_cells]; X/Y/valid: lane-padded
    beams (multiple of 128).  Returns the matched world pose f32[3].
    """
    assert tuple(cfg.offset) == (0.0, 0.0), cfg.offset
    n = X.shape[0]
    assert n % LANES == 0, n
    n_rows = n // LANES
    ct = table.shape[0]
    ct_pad = -(-ct // LANES) * LANES
    # pad one extra row so base+width+1 of the last cell stays in bounds
    tbl = jnp.concatenate([table,
                           jnp.zeros(ct_pad - ct + LANES, table.dtype)])
    tbl2 = tbl.reshape(-1, LANES)

    levels = tuple(
        (cfg.level_offsets[lv], cfg.level_sizes[lv],
         1.0 / cfg.level_resolutions[lv])
        for lv in range(cfg.num_levels - 1, -1, -1))
    iters = tuple(cfg.estimate_iterations[lv]
                  for lv in range(cfg.num_levels - 1, -1, -1))

    kernel = functools.partial(
        _matcher_kernel, levels=levels, iters_per_level=iters,
        deriv_clamp=cfg.deriv_clamp, n_rows=n_rows)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3,), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # pose [3]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # table [Ct/128, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # X [rows, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # Y
            pl.BlockSpec(memory_space=pltpu.VMEM),    # valid (f32)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_rows, LANES), jnp.int32),   # base
            pltpu.VMEM((n_rows, LANES), jnp.float32),  # fx
            pltpu.VMEM((n_rows, LANES), jnp.float32),  # fy
            pltpu.VMEM((n_rows, LANES), jnp.float32),  # rx
            pltpu.VMEM((n_rows, LANES), jnp.float32),  # ry
            pltpu.VMEM((n_rows, LANES), jnp.float32),  # mask
        ],
        interpret=interpret,
    )(jnp.asarray(pose_world, jnp.float32), tbl2,
      X.reshape(n_rows, LANES), Y.reshape(n_rows, LANES),
      valid.astype(jnp.float32).reshape(n_rows, LANES))
    return out
