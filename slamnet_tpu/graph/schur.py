"""Node-sharded distributed Gauss-Newton via Schur-complement reduction.

The pose-graph solve the north star names (BASELINE.md): nodes are sharded in
contiguous blocks over a mesh axis; each shard ELIMINATES ITS INTERIOR NODES
LOCALLY (one-level nested dissection) and only SEPARATOR blocks — nodes touched
by cross-shard edges, a small static-capacity set — are exchanged and solved
replicated.  Interior Hessian blocks never leave their shard, unlike
graph/distributed.py's edge-sharded form which psums the full dense [3K, 3K].

Per GN step, on each shard (all inside one shard_map):
  1. classify: an edge is INTERNAL if both endpoints fall in this shard's node
     block, CROSS otherwise; a local node is a SEPARATOR iff a cross edge
     touches it (node 0 is forced separator so the gauge anchor lands in the
     reduced system);
  2. build the local dense (H_loc [3m,3m], b_loc) from internal edges +
     interior damping;
  3. eliminate interiors by identity-decoupling (no permutations needed for
     fixed shapes): C = D H D + (I-D) with D the interior var mask, so
     C^-1 = H_II^-1 (+) I, then S_loc = H_SS - H_SI H_II^-1 H_IS and
     rhs_loc = b_S - H_SI H_II^-1 b_I, all as masked dense ops;
  4. pack this shard's separator rows/cols into `sep_capacity` static slots
     (stable argsort of the separator mask), all-gather the slot->node tables,
     accumulate cross-edge blocks straight into packed coordinates, psum the
     packed [3*S*P, 3*S*P] separator system — the ONLY inter-shard exchange;
  5. solve the small separator system replicated, back-substitute interiors
     locally, all-gather the updated poses.

Algebraically exact: equals posegraph.gn_step to float tolerance
(tests/test_posegraph.py::test_schur_node_sharded_equals_dense).

Capacity: a shard with more separators than `sep_capacity` cannot pack them
all; the excess nodes' rows stay OUT of the reduced system and the solve is
wrong.  Every step therefore counts the per-shard excess and returns the
psum'd total as `sep_overflow` — production callers (models/graph_slam_sharded)
surface it in their per-scan info so an overflow is a loud counter, never a
silently-wrong trajectory (tests/test_posegraph.py::test_separator_overflow_is_loud).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.geometry import normalize_angle
from . import posegraph


def schur_local_step(poses, node_valid, ei, ej, em, ew, ev, *, n_shards: int,
                     sep_capacity: int, anchor_weight: float, damping: float,
                     axis: str, huber_delta: float = 0.0,
                     robust_kernel: str = "dcs") -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """The shard-local body of one Schur GN step (call INSIDE a shard_map whose
    mesh has axis `axis` of size `n_shards`; all inputs replicated).

    huber_delta > 0 applies the same per-edge robust IRLS scale as
    posegraph.build_normal_equations (replicated math — every shard computes
    the identical scale), keeping dense/sharded parity for robust solves.

    Returns (new_poses f32[K,3] replicated, sep_overflow i32[] replicated) —
    sep_overflow counts separator nodes beyond capacity summed over shards
    (nonzero means the reduced system dropped rows and the step is WRONG).
    """
    k = poses.shape[0]
    assert k % n_shards == 0, (k, n_shards)
    m = k // n_shards
    p = min(sep_capacity, m)   # a shard can never exceed its block size
    sp = n_shards * p

    s = jax.lax.axis_index(axis)
    local_ids = s * m + jnp.arange(m)

    shard_i = ei // m
    shard_j = ej // m
    internal = ev & (shard_i == s) & (shard_j == s)
    cross = ev & (shard_i != shard_j)

    # ---- separator mask over ALL nodes (cheap K-bool), then local slice
    sep_all = jnp.zeros(k, bool)
    sep_all = sep_all.at[jnp.where(cross, ei, 0)].max(cross)
    sep_all = sep_all.at[jnp.where(cross, ej, 0)].max(cross)
    sep_all = sep_all.at[0].set(True)           # gauge anchor
    sep_loc = sep_all[local_ids] & node_valid[local_ids]   # bool[m]

    # capacity check: separators beyond the static slot budget fall out of
    # the reduced system — count them loudly
    sep_overflow = jax.lax.psum(
        jnp.maximum(jnp.sum(sep_loc.astype(jnp.int32)) - p, 0), axis)

    # ---- local dense normal equations from INTERNAL edges --------------
    r, ji, jj = posegraph.edge_residuals_and_jacobians(poses, ei, ej, em,
                                                       ev)
    if huber_delta > 0.0:
        ew = ew * posegraph.robust_scale(r, ew * ev[:, None], huber_delta,
                                         robust_kernel)[:, None]
    w = ew * internal[:, None]
    li = jnp.where(internal, ei - s * m, 0)
    lj = jnp.where(internal, ej - s * m, 0)

    def blocks(ja, jb):
        return jnp.einsum("eri,er,erj->eij", ja, w, jb)

    Hb = jnp.zeros((m, 3, m, 3), jnp.float32)
    Hb = Hb.at[li, :, li, :].add(blocks(ji, ji))
    Hb = Hb.at[li, :, lj, :].add(blocks(ji, jj))
    Hb = Hb.at[lj, :, li, :].add(jnp.swapaxes(blocks(ji, jj), 1, 2))
    Hb = Hb.at[lj, :, lj, :].add(blocks(jj, jj))
    bv = jnp.zeros((m, 3), jnp.float32)
    bv = bv.at[li].add(jnp.einsum("eri,er,er->ei", ji, w, r))
    bv = bv.at[lj].add(jnp.einsum("eri,er,er->ei", jj, w, r))
    H_loc = Hb.reshape(3 * m, 3 * m)
    b_loc = bv.reshape(3 * m)

    valid_loc = node_valid[local_ids]
    int_loc = valid_loc & ~sep_loc               # interior & valid
    dmask = jnp.repeat(int_loc, 3).astype(jnp.float32)      # [3m]
    smask = jnp.repeat(sep_loc, 3).astype(jnp.float32)
    # interior damping inside H_II; invalid nodes get identity rows
    inval = jnp.repeat(~valid_loc, 3)
    diag_int = jnp.where(inval, 1.0, dmask * damping)
    H_loc = H_loc + jnp.diag(diag_int)

    # ---- eliminate interiors: C^-1 = H_II^-1 (+) I ---------------------
    Hm = H_loc * dmask[:, None] * dmask[None, :] \
        + jnp.diag(jnp.where(inval, 1.0, 1.0 - dmask))
    Cinv = jnp.linalg.inv(Hm)
    A_si = H_loc * smask[:, None] * dmask[None, :]
    G = A_si @ Cinv
    S_loc = (H_loc * smask[:, None] * smask[None, :]) - G @ A_si.T
    rhs_loc = smask * b_loc - G @ (dmask * b_loc)

    # ---- pack this shard's separators into P static slots --------------
    order = jnp.argsort(~sep_loc, stable=True)   # separators first
    slot_node_loc = order[:p]                    # local node index per slot
    slot_valid = sep_loc[slot_node_loc]          # bool[P]
    idx3 = (slot_node_loc[:, None] * 3 + jnp.arange(3)).reshape(-1)  # [3P]
    S_pack = S_loc[idx3][:, idx3]
    S_pack = S_pack * (jnp.repeat(slot_valid, 3)[:, None]
                       * jnp.repeat(slot_valid, 3)[None, :])
    rhs_pack = rhs_loc[idx3] * jnp.repeat(slot_valid, 3)

    # global slot tables (the small exchange: S*P node ids)
    slot_nodes_glob = jnp.where(slot_valid, s * m + slot_node_loc, k)
    all_slots = jax.lax.all_gather(slot_nodes_glob, axis,
                                   tiled=True)     # i32[S*P], k = invalid
    slot_of = jnp.full(k + 1, sp, jnp.int32).at[all_slots].set(
        jnp.arange(sp, dtype=jnp.int32))           # node -> packed slot

    # ---- assemble the packed separator system --------------------------
    Sg = jnp.zeros((3 * sp + 3, 3 * sp + 3), jnp.float32)
    Sg = jax.lax.dynamic_update_slice(Sg, S_pack, (s * 3 * p, s * 3 * p))
    rg = jnp.zeros(3 * sp + 3, jnp.float32)
    rg = jax.lax.dynamic_update_slice(rg, rhs_pack, (s * 3 * p,))

    # cross edges: this shard handles those whose i-endpoint it owns
    mine = cross & (shard_i == s)
    wc = ew * mine[:, None]
    si = slot_of[jnp.where(mine, ei, k)]         # sp = dump slot
    sj = slot_of[jnp.where(mine, ej, k)]

    def xblocks(ja, jb):
        return jnp.einsum("eri,er,erj->eij", ja, wc, jb)

    Sg4 = Sg.reshape(sp + 1, 3, sp + 1, 3)
    Sg4 = Sg4.at[si, :, si, :].add(xblocks(ji, ji))
    Sg4 = Sg4.at[si, :, sj, :].add(xblocks(ji, jj))
    Sg4 = Sg4.at[sj, :, si, :].add(jnp.swapaxes(xblocks(ji, jj), 1, 2))
    Sg4 = Sg4.at[sj, :, sj, :].add(xblocks(jj, jj))
    rg3 = rg.reshape(sp + 1, 3)
    rg3 = rg3.at[si].add(jnp.einsum("eri,er,er->ei", ji, wc, r))
    rg3 = rg3.at[sj].add(jnp.einsum("eri,er,er->ei", jj, wc, r))
    Sg = Sg4.reshape(3 * (sp + 1), 3 * (sp + 1))
    rg = rg3.reshape(-1)

    # THE inter-shard exchange: one psum of the packed separator system
    Sg = jax.lax.psum(Sg, axis)
    rg = jax.lax.psum(rg, axis)

    # damping + anchor + identity pad rows (replicated math)
    slot_live = all_slots < k                     # bool[S*P]
    live3 = jnp.concatenate([jnp.repeat(slot_live, 3),
                             jnp.zeros(3, bool)])
    diag = jnp.where(live3, damping, 1.0)
    anchor_slot = slot_of[0]
    diag = diag.at[anchor_slot * 3].add(anchor_weight)
    diag = diag.at[anchor_slot * 3 + 1].add(anchor_weight)
    diag = diag.at[anchor_slot * 3 + 2].add(anchor_weight)
    Sg = Sg + jnp.diag(diag)

    dx_sep = jnp.linalg.solve(Sg, -rg)            # [3(SP+1)]

    # ---- back-substitute interiors locally ------------------------------
    my_sep = jax.lax.dynamic_slice(dx_sep, (s * 3 * p,), (3 * p,))
    x_fill = jnp.zeros(3 * m, jnp.float32).at[idx3].set(
        my_sep * jnp.repeat(slot_valid, 3))
    x_int = Cinv @ (dmask * (-b_loc - H_loc @ x_fill))
    dx_loc = dmask * x_int + x_fill               # [3m]

    new_loc = poses[local_ids] + dx_loc.reshape(m, 3)
    new_loc = jnp.where(valid_loc[:, None], new_loc, poses[local_ids])
    new_loc = new_loc.at[:, 2].set(normalize_angle(new_loc[:, 2]))
    new_poses = jax.lax.all_gather(new_loc, axis, tiled=True)   # [K, 3]
    return new_poses, sep_overflow


def schur_gn_step(mesh: Mesh, g: posegraph.PoseGraph,
                  anchor_weight: float = 1e6, damping: float = 1e-6,
                  sep_capacity: int = 16, axis: str = "node",
                  huber_delta: float = 0.0) -> Tuple[posegraph.PoseGraph,
                                                     jnp.ndarray]:
    """One GN step with nodes sharded over `axis` (K divisible by its size).

    sep_capacity: max separator nodes per shard (static slots).  Returns
    (graph, sep_overflow i32[]): nonzero overflow means separators were
    dropped from the reduced system and the step must not be trusted.
    """
    n_shards = mesh.shape[axis]

    def local(poses, node_valid, ei, ej, em, ew, ev):
        return schur_local_step(poses, node_valid, ei, ej, em, ew, ev,
                                n_shards=n_shards, sep_capacity=sep_capacity,
                                anchor_weight=anchor_weight, damping=damping,
                                axis=axis, huber_delta=huber_delta)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    poses, overflow = fn(g.poses, g.node_valid, g.edge_i, g.edge_j,
                         g.edge_meas, g.edge_w, g.edge_valid)
    return g._replace(poses=poses), overflow


def check_separator_capacity(g: posegraph.PoseGraph, n_shards: int,
                             sep_capacity: int) -> bool:
    """Host-side guard: every shard's separator count must fit its slots."""
    import numpy as np
    k = g.poses.shape[0]
    m = k // n_shards
    ei = np.asarray(g.edge_i)
    ej = np.asarray(g.edge_j)
    ev = np.asarray(g.edge_valid)
    cross = ev & (ei // m != ej // m)
    sep = np.zeros(k, bool)
    sep[ei[cross]] = True
    sep[ej[cross]] = True
    sep[0] = True
    counts = sep.reshape(n_shards, m).sum(axis=1)
    return bool((counts <= sep_capacity).all())


def schur_optimize(mesh: Mesh, g: posegraph.PoseGraph, iterations: int = 10,
                   anchor_weight: float = 1e6, damping: float = 1e-6,
                   sep_capacity: int = 16,
                   axis: str = "node") -> Tuple[posegraph.PoseGraph,
                                                jnp.ndarray]:
    """Iterated Schur GN.  Returns (graph, max sep_overflow over iterations);
    callers MUST surface/check the overflow (see schur_local_step)."""
    worst = jnp.zeros((), jnp.int32)
    for _ in range(iterations):
        g, overflow = schur_gn_step(mesh, g, anchor_weight, damping,
                                    sep_capacity, axis)
        worst = jnp.maximum(worst, overflow)
    return g, worst
