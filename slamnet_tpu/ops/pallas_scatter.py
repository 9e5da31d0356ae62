"""Pallas occupancy-scatter kernel — interpret-mode reference implementation.

XLA lowers large scatters to serialized read-modify-writes (~1.7 ms for a
160k-point scatter into 400x400; docs/PERF.md).  This kernel explores the
on-chip alternative: grid in VMEM, point loop serialized in-kernel, each update
a 128-lane ROW read-modify-write (the mark grid is [C/128, 128]; a point
(row, col) ORs a one-hot lane vector into its row), and the log-odds apply
fused into the same launch.

STATUS (v5e, Mosaic as of jax 0.9): NOT deployable on hardware —
  * Mosaic has no scalar VMEM stores (the natural formulation);
  * per-point index access needs the indices in SMEM, and 160k-entry index
    lists far exceed SMEM capacity (the compile helper rejects the kernel).
A hardware version needs chunked index DMA (HBM->SMEM in small blocks) or a
different decomposition.  Until then ops/logodds.py's XLA scatter (which the
hardware serializes anyway at ~100M updates/s) remains the production path,
and this kernel is kept as the semantics reference for the kernel-path work —
exact vs the XLA formulation under interpret=True (tests/test_pallas_scatter.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _scatter_kernel(rows_ref, cols_ref, mask_ref, orows_ref, ocols_ref,
                    omask_ref, maps_ref, out_ref, mark_ref, *, lof, loo, cap):
    mark_ref[:] = jnp.zeros_like(mark_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    npts = rows_ref.shape[0]

    def free_body(i, _):
        @pl.when(mask_ref[i] != 0)
        def _():
            r = rows_ref[i]
            onehot = (lane == cols_ref[i]).astype(jnp.int32)
            cur = mark_ref[pl.ds(r, 1), :]
            mark_ref[pl.ds(r, 1), :] = jnp.maximum(cur, onehot)
        return 0

    jax.lax.fori_loop(0, npts, free_body, 0)

    nocc = orows_ref.shape[0]

    def occ_body(i, _):
        @pl.when(omask_ref[i] != 0)
        def _():
            r = orows_ref[i]
            onehot = (lane == ocols_ref[i]).astype(jnp.int32) * 2
            cur = mark_ref[pl.ds(r, 1), :]
            # occ (2) overrides free (1)
            mark_ref[pl.ds(r, 1), :] = jnp.maximum(cur, onehot)
        return 0

    jax.lax.fori_loop(0, nocc, occ_body, 0)

    m = mark_ref[:]
    v = maps_ref[:]
    out_ref[:] = (v
                  + jnp.where(m == 1, lof, 0.0)
                  + jnp.where((m == 2) & (v < cap), loo, 0.0))


def occupancy_scatter_pallas(maps_flat: jnp.ndarray, flat: jnp.ndarray,
                             fmask: jnp.ndarray, occ_flat: jnp.ndarray,
                             omask: jnp.ndarray, log_odds_free: float,
                             log_odds_occupied: float,
                             occupied_cap: float = 50.0,
                             interpret: bool = False) -> jnp.ndarray:
    """Apply one scan's free/occ marks to a flat map (indices pre-offset).

    maps_flat: f32[C] with C a multiple of 128; flat/fmask: i32/bool[P]
    free-cell candidates; occ_flat/omask: i32/bool[E] endpoints.  Semantics
    identical to the order-independent update in ops/logodds.py.
    """
    total = maps_flat.shape[0]
    assert total % LANES == 0, total
    rows = (flat // LANES).reshape(-1).astype(jnp.int32)
    cols = (flat % LANES).reshape(-1).astype(jnp.int32)
    orows = (occ_flat // LANES).reshape(-1).astype(jnp.int32)
    ocols = (occ_flat % LANES).reshape(-1).astype(jnp.int32)

    kernel = functools.partial(_scatter_kernel, lof=log_odds_free,
                               loo=log_odds_occupied, cap=occupied_cap)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((total // LANES, LANES),
                                       maps_flat.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((total // LANES, LANES), jnp.int32)],
        interpret=interpret,
    )(rows, cols, fmask.reshape(-1).astype(jnp.int32), orows, ocols,
      omask.reshape(-1).astype(jnp.int32), maps_flat.reshape(-1, LANES))
    return out.reshape(-1)
