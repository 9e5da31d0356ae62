"""Pallas dense polar occupancy fill — the deployable TPU kernel.

The scatter-free dense fill (ops/logodds.update_occupancy_dense) is the right
formulation for mapping-heavy workloads; its XLA lowering was originally
dominated by the per-cell ``table[cbin]`` gather, which TPU XLA serializes.
Round 5 removed that wall IN XLA (the one-hot MXU lookup: 1818 -> 344 us per
400x400 update, docs/PERF.md), so this kernel is now purely the
deployable-Pallas baseline/reference — the production path is the XLA fill.

This kernel fuses the ENTIRE fill — per-cell polar geometry, the range-table
lookup, the free test, and the log-odds apply — into one VMEM-resident pass:

  * grid over 8-row blocks of the (lane-padded) [W, Wp] map;
  * the polar range table rides in SMEM and the lookup is a select-accumulate
    sweep over the static bin axis (one broadcast compare+select per bin on
    the whole block — no serialized gather anywhere);
  * the occupied-endpoint mask (a cheap B-point XLA scatter) comes in as a
    block input; everything else is closed-form VPU math.

Semantics: identical to update_occupancy_dense (same formulas, same dtypes);
tests assert exact agreement in interpret mode and the TPU build is measured
in scripts/bench_pallas_fill.py / docs/PERF.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _fill_kernel(scalars_ref, table_ref, occ_ref, maps_ref, out_ref, *,
                 width: int, angle_bins: int, lof: float, loo: float,
                 cap: float, margin: float):
    """One [8, Wp] row block: free-test every cell against the polar table."""
    bx = scalars_ref[0]
    by = scalars_ref[1]
    any_beam = scalars_ref[2] > 0.0

    i = pl.program_id(0)
    yy = (jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
          + i * out_ref.shape[0])
    xx = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    dx = xx.astype(jnp.float32) - bx
    dy = yy.astype(jnp.float32) - by
    r_cell = jnp.sqrt(dx * dx + dy * dy)

    # Bin lookup WITHOUT atan2 (unimplemented in Mosaic) and WITHOUT a
    # serialized gather: sweep the (small, static) bin axis; a cell is in bin
    # k iff it lies between the boundary rays phi_k and phi_{k+1}, tested by
    # cross products.  The k+1 boundary of one iteration is the k boundary of
    # the next, so the sweep carries one cross-product plane per step: one
    # scalar sin/cos + a handful of broadcast VPU ops per bin on the whole
    # [8, Wp] block.
    step = 2.0 * jnp.pi / angle_bins

    def lookup(k, carry):
        r_lim, cross_prev = carry
        phi1 = (k + 1).astype(jnp.float32) * step - jnp.pi
        cross_next = jnp.cos(phi1) * dy - jnp.sin(phi1) * dx
        # the final boundary ray is theta = +pi itself (atan2's closed end):
        # widen the last bin by a relative epsilon so the half-row of cells
        # exactly on that ray lands in bin A-1 instead of nowhere
        last = k == angle_bins - 1
        thresh = jnp.where(last, 1e-5 * r_cell + 1e-6, 0.0)
        in_k = (cross_prev >= 0.0) & (cross_next < thresh)
        return jnp.where(in_k, table_ref[k], r_lim), cross_next

    phi0 = -jnp.pi
    cross0 = jnp.cos(phi0) * dy - jnp.sin(phi0) * dx
    r_lim, _ = jax.lax.fori_loop(0, angle_bins, lookup,
                                 (jnp.zeros_like(r_cell), cross0))

    is_occ = occ_ref[:] > 0
    is_free = (r_cell < r_lim - margin) & (r_cell > 0.0) & ~is_occ & any_beam
    v = maps_ref[:]
    out_ref[:] = (v + jnp.where(is_free, lof, 0.0)
                  + jnp.where(is_occ & (v < cap), loo, 0.0))


def polar_fill_pallas(logodds_flat: jnp.ndarray, width: int,
                      table: jnp.ndarray, occ: jnp.ndarray,
                      robot_px: jnp.ndarray, any_beam: jnp.ndarray,
                      log_odds_free: float, log_odds_occupied: float,
                      occupied_cap: float = 50.0,
                      interpret: bool = False,
                      free_margin_px: float = 0.75) -> jnp.ndarray:
    """Fused dense polar fill.

    logodds_flat f32[width*width]; table f32[A] per-bin min beam range (px,
    0 = uncovered sector); occ i32[width*width] occupied-endpoint mask;
    robot_px f32[2] rounded robot cell; any_beam bool.
    """
    angle_bins = table.shape[0]
    wp = -(-width // LANES) * LANES
    hp = -(-width // SUBLANES) * SUBLANES
    maps2 = jnp.zeros((hp, wp), jnp.float32).at[:width, :width].set(
        logodds_flat.reshape(width, width))
    occ2 = jnp.zeros((hp, wp), jnp.int32).at[:width, :width].set(
        occ.reshape(width, width))
    scalars = jnp.stack([robot_px[0], robot_px[1],
                         any_beam.astype(jnp.float32)])

    kernel = functools.partial(_fill_kernel, width=width,
                               angle_bins=angle_bins, lof=log_odds_free,
                               loo=log_odds_occupied, cap=occupied_cap,
                               margin=free_margin_px)
    out = pl.pallas_call(
        kernel,
        grid=(hp // SUBLANES,),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # scalars [3]
            pl.BlockSpec(memory_space=pltpu.SMEM),            # table [A]
            pl.BlockSpec((SUBLANES, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # occ block
            pl.BlockSpec((SUBLANES, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # maps block
        ],
        out_specs=pl.BlockSpec((SUBLANES, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, table, occ2, maps2)
    return out[:width, :width].reshape(-1)


def update_occupancy_dense_pallas(logodds_flat: jnp.ndarray, width: int,
                                  points: jnp.ndarray, valid: jnp.ndarray,
                                  robot_pose_world: jnp.ndarray,
                                  scan_pose: jnp.ndarray, scale_to_map: float,
                                  log_odds_free: float,
                                  log_odds_occupied: float,
                                  occupied_cap: float = 50.0,
                                  angle_bins: int = 256,
                                  interpret: bool = False,
                                  free_margin_px: float = 0.75) -> jnp.ndarray:
    """Drop-in twin of ops.logodds.update_occupancy_dense with the dense pass
    as a Pallas kernel.  The beam-side prep (range table + endpoint scatter,
    both B-point work) stays XLA."""
    from ..core.geometry import dotnet_round

    theta = robot_pose_world[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx, ty = robot_pose_world[0], robot_pose_world[1]
    bx = (c * scan_pose[0] - s * scan_pose[1] + tx) * scale_to_map
    by = (s * scan_pose[0] + c * scan_pose[1] + ty) * scale_to_map
    bxi, byi = dotnet_round(bx), dotnet_round(by)

    ex = (c * points[:, 0] - s * points[:, 1] + tx) * scale_to_map
    ey = (s * points[:, 0] + c * points[:, 1] + ty) * scale_to_map
    exi, eyi = dotnet_round(ex), dotnet_round(ey)

    in_dims = lambda x, y: (x >= 0) & (x < width) & (y >= 0) & (y < width)
    same = (exi == bxi) & (eyi == byi)
    beam_ok = valid & ~same & in_dims(bxi, byi) & in_dims(exi, eyi)

    dxe = (exi - bxi).astype(jnp.float32)
    dye = (eyi - byi).astype(jnp.float32)
    r_beam = jnp.sqrt(dxe * dxe + dye * dye)
    ang = jnp.arctan2(dye, dxe)
    bins = ((ang + jnp.pi) * (angle_bins / (2.0 * jnp.pi))).astype(jnp.int32)
    bins = jnp.clip(bins, 0, angle_bins - 1)
    big = jnp.float32(1e9)
    table = jnp.full(angle_bins, big, jnp.float32).at[
        jnp.where(beam_ok, bins, 0)].min(jnp.where(beam_ok, r_beam, big))
    table = jnp.where(table >= big, 0.0, table)

    end_flat = eyi * width + exi
    occ = jnp.zeros(width * width, jnp.int32).at[
        jnp.where(beam_ok, end_flat, 0)].max(beam_ok.astype(jnp.int32))

    return polar_fill_pallas(
        logodds_flat, width, table, occ,
        jnp.stack([bxi.astype(jnp.float32), byi.astype(jnp.float32)]),
        jnp.any(beam_ok), log_odds_free, log_odds_occupied, occupied_cap,
        interpret=interpret, free_margin_px=free_margin_px)
