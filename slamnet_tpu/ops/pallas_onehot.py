"""Pallas one-hot GN matcher: the whole coarse-to-fine match in ONE kernel.

The round-3 Pallas attempt (ops/pallas_gn.py) died on Mosaic's missing vector
gather; the one-hot MXU reformulation (ops/gn.py) removed the gathers — which
makes the matcher Pallas-expressible at last.  This kernel runs ALL pyramid
levels' GN iterations (ScanMatcher.cs:41-125 semantics, the same math as
ops.gn.fused_gn_iteration_onehot_stats in bf16 mode) with every per-level row
table RESIDENT IN VMEM for the whole match:

  * beams live on SUBLANES ([N, 1] coords): every one-hot mask is then a
    plain broadcast compare against a lane iota — no transposes, no gathers;
  * row selection is ONE native [N, wp] x [wp, 2*lanes] matmul per GN
    iteration against the resident table with its y+1-shifted twin
    concatenated on lanes (round 5; fetches both bilinear rows at once),
    lane selection an elementwise mask-multiply + lane reduction;
  * the XLA path re-materializes the one-hot masks and selected planes
    through HBM every iteration (~6 MB/iteration); here they never leave
    VMEM, and the tables load once per match instead of once per iteration.

All scalar state (pose, Hessian entries, the 3x3 solve) is carried as (1, 1)
vectors so nothing touches Mosaic's scalar unit for transcendentals/division.

Semantics: identical structure to the XLA onehot kernel with bf16 operands
(one-hot rows select single bf16-rounded table entries), fixed per-level
iteration counts, theta clamp, optional xy clamp/damping, heading normalized
between levels, empty-scan fallback to the hint.  cfg.offset must be (0, 0)
(the only configuration every model driver uses — MapRepMultiMap passes zero).

Exposed as ``matcher_mode="pallas"`` via models.hector; parity asserted in
tests/test_pallas_onehot.py (interpret mode on CPU vs the XLA onehot path).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gn import level_lanes

_TWO_PI = 2.0 * math.pi


def _row_pad(w: int) -> int:
    """bf16 sublane tile is 16 rows."""
    return -(-w // 16) * 16


def prepare_tables(table: jnp.ndarray, cfg):
    """XLA prolog, once per match: per-level bf16 row tables with the
    y+1-shifted twin CONCATENATED on lanes ([wp_l, 2*lanes_l]), row-padded
    to the bf16 sublane tile — one matmul per GN iteration fetches both the
    yi and yi+1 rows (round 5; was two matmuls).  ~1.5 MB of copies."""
    outs = []
    for level in range(cfg.num_levels):
        w = cfg.level_sizes[level]
        off = cfg.level_offsets[level]
        lanes = level_lanes(w)
        g = table[off:off + w * w].reshape(w, w).astype(jnp.bfloat16)
        g = jnp.pad(g, ((0, _row_pad(w) - w), (0, lanes - w)))
        gs = jnp.pad(g[1:], ((0, 1), (0, 0)))      # row r -> table row r+1
        outs.append(jnp.concatenate([g, gs], axis=1))
    return tuple(outs)


def _match_kernel(cfg, n_pad, batched, *refs):
    """Kernel body: refs = (t2_0, ..., t2_{L-1}, X, Y, V, pose0, out)\n    with t2_l = [wp_l, 2*lanes_l] (table | y+1-shifted twin on lanes).

    batched=False: pose_ref is a (1, 4) SMEM block, out_ref a (1, 128) VMEM
    block.  batched=True (fleet; grid over instances): pose_ref is the FULL
    [B, 4] SMEM array indexed by program_id, out_ref an (8, 128) block
    (Mosaic requires the last two block dims be (8k, 128k) or the array
    dims, so per-instance rows are padded to one sublane tile)."""
    nl = cfg.num_levels
    tabs = refs[:nl]
    X_ref, Y_ref, V_ref, pose_ref, out_ref = refs[nl:]

    X = X_ref[:]                       # [N, 1] f32, beams on sublanes
    Y = Y_ref[:]
    V = V_ref[:]                       # [N, 1] f32 0/1
    row = pl.program_id(0) if batched else 0

    def s11(v):
        return jnp.full((1, 1), v, jnp.float32)

    px = s11(pose_ref[row, 0])         # pose carried as (1, 1) vectors
    py = s11(pose_ref[row, 1])
    th = s11(pose_ref[row, 2])
    stats = {"fails": s11(0.0), "resid": s11(0.0), "n_in": s11(0.0)}

    def one_level(level, px, py, th):
        w = cfg.level_sizes[level]
        wp = _row_pad(w)
        lanes = level_lanes(w)
        scale = 1.0 / cfg.level_resolutions[level]
        t2_ref = tabs[level]            # [wp, 2*lanes]: table | y+1 twin
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, wp), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, lanes), 1)

        # world -> map px (cfg.offset == (0,0) asserted by the builder)
        ex = px * scale
        ey = py * scale

        for _ in range(cfg.estimate_iterations[level]):
            sr = jnp.sin(th) * scale                     # (1, 1)
            cr = jnp.cos(th) * scale
            mx = cr * X - sr * Y + ex                    # [N, 1]
            my = sr * X + cr * Y + ey
            ok = (V > 0.0) & (mx >= 0.0) & (mx <= w - 2) \
                & (my >= 0.0) & (my <= w - 2)
            xi = jnp.clip(mx.astype(jnp.int32), 0, w - 2)
            yi = jnp.clip(my.astype(jnp.int32), 0, w - 2)

            oh_y = (yi == row_iota).astype(jnp.bfloat16)     # [N, wp]
            rr = jnp.dot(oh_y, t2_ref[:],         # t[yi, :] | t[yi+1, :]
                         preferred_element_type=jnp.float32)  # [N, 2*lanes]
            r0 = rr[:, :lanes]
            r1 = rr[:, lanes:]
            oh_x0 = (xi == lane_iota).astype(jnp.float32)    # [N, lanes]
            oh_x1 = ((xi + 1) == lane_iota).astype(jnp.float32)
            v0 = jax.nn.sigmoid(jnp.sum(r0 * oh_x0, axis=1, keepdims=True))
            v1 = jax.nn.sigmoid(jnp.sum(r0 * oh_x1, axis=1, keepdims=True))
            v2 = jax.nn.sigmoid(jnp.sum(r1 * oh_x0, axis=1, keepdims=True))
            v3 = jax.nn.sigmoid(jnp.sum(r1 * oh_x1, axis=1, keepdims=True))

            fx = mx - xi
            fy = my - yi
            xf = 1.0 - fx
            yf = 1.0 - fy
            val = (v0 * xf + v1 * fx) * yf + (v2 * xf + v3 * fx) * fy
            gx = -((v0 - v1) * xf + (v2 - v3) * fx)
            gy = -((v0 - v2) * yf + (v1 - v3) * fy)
            z = jnp.float32(0.0)
            gx = jnp.where(ok, gx, z)
            gy = jnp.where(ok, gy, z)
            fun = jnp.where(ok, 1.0 - val, z)
            rot = (-sr * X - cr * Y) * gx + (cr * X - sr * Y) * gy
            okf = ok.astype(jnp.float32)

            def tot(x):                                  # sum over beams
                return jnp.sum(x, axis=0, keepdims=True)  # (1, 1)

            d0 = tot(gx * fun)
            d1 = tot(gy * fun)
            d2 = tot(rot * fun)
            H00 = tot(gx * gx)
            H01 = tot(gx * gy)
            H02 = tot(gx * rot)
            H11 = tot(gy * gy)
            H12 = tot(gy * rot)
            H22 = tot(rot * rot)
            if cfg.gn_damping > 0.0:
                H00 = H00 * (1.0 + cfg.gn_damping)
                H11 = H11 * (1.0 + cfg.gn_damping)
                H22 = H22 * (1.0 + cfg.gn_damping)
            a0 = H11 * H22 - H12 * H12
            a1 = H02 * H12 - H01 * H22
            a2 = H01 * H12 - H02 * H11
            det = H00 * a0 + H01 * a1 + H02 * a2
            b1 = H00 * H22 - H02 * H02
            b2 = H01 * H02 - H00 * H12
            c2 = H00 * H11 - H01 * H01
            okd = (H00 != 0.0) & (H11 != 0.0) & (det != 0.0) \
                & jnp.isfinite(det)
            inv = jnp.where(okd, 1.0 / jnp.where(det == 0.0, 1.0, det),
                            jnp.float32(0.0))
            s0 = (a0 * d0 + a1 * d1 + a2 * d2) * inv
            s1 = (a1 * d0 + b1 * d1 + b2 * d2) * inv
            if cfg.xy_step_clamp_px > 0.0:
                s0 = jnp.clip(s0, -cfg.xy_step_clamp_px, cfg.xy_step_clamp_px)
                s1 = jnp.clip(s1, -cfg.xy_step_clamp_px, cfg.xy_step_clamp_px)
            s2 = jnp.clip((a2 * d0 + b2 * d1 + c2 * d2) * inv,
                          -cfg.deriv_clamp, cfg.deriv_clamp)
            ex = ex + s0
            ey = ey + s1
            th = th + s2
            # matcher health (ScanMatcher.cs:99-115 parity): failed-solve
            # count + last iteration's residual sum / in-bounds beam count
            def tot2(x):
                return jnp.sum(x, axis=0, keepdims=True)
            stats["fails"] = stats["fails"] + jnp.where(okd, 0.0, 1.0)
            stats["resid"] = tot2(fun * fun)
            stats["n_in"] = tot2(okf)

        # heading wrap to (-pi, pi] (MathEx.NormalizeAngle) + map -> world
        a = jnp.mod(jnp.mod(th, _TWO_PI) + _TWO_PI, _TWO_PI)
        th = jnp.where(a > jnp.pi, a - _TWO_PI, a)
        return ex / scale, ey / scale, th

    for level in range(nl - 1, -1, -1):
        px, py, th = one_level(level, px, py, th)

    # empty-scan fallback to the hint (ScanMatcher.cs:82-83)
    any_valid = jnp.sum(V, axis=0, keepdims=True) > 0.0
    px = jnp.where(any_valid, px, s11(pose_ref[row, 0]))
    py = jnp.where(any_valid, py, s11(pose_ref[row, 1]))
    th = jnp.where(any_valid, th, s11(pose_ref[row, 2]))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(lane == 0, px, jnp.where(lane == 1, py,
                    jnp.where(lane == 2, th,
                    jnp.where(lane == 3, stats["fails"],
                    jnp.where(lane == 4, stats["resid"],
                    jnp.where(lane == 5, stats["n_in"],
                              jnp.float32(0.0)))))))
    if batched:
        out_ref[:] = jnp.broadcast_to(out, (8, 128))
    else:
        out_ref[:] = out


def prepare_tables_batch(flat: jnp.ndarray, b: int, cfg):
    """Fleet twin of prepare_tables: flat f32[B*cells] -> per level
    (bf16[B*wp_l, lanes_l], y+1-shifted twin) with each instance's padded
    rows contiguous, ready for per-instance BlockSpec indexing."""
    cells = sum(w * w for w in cfg.level_sizes)
    grids = flat.reshape(b, cells)
    outs = []
    for level in range(cfg.num_levels):
        w = cfg.level_sizes[level]
        off = cfg.level_offsets[level]
        lanes = level_lanes(w)
        wp = _row_pad(w)
        g = grids[:, off:off + w * w].reshape(b, w, w).astype(jnp.bfloat16)
        g = jnp.pad(g, ((0, 0), (0, wp - w), (0, lanes - w)))
        gs = jnp.pad(g[:, 1:], ((0, 0), (0, 1), (0, 0)))  # row r -> row r+1
        outs.append(jnp.concatenate([g, gs], axis=2).reshape(
            b * wp, 2 * lanes))
    return tuple(outs)


def make_pallas_match_batch(cfg, n_pad: int, b: int, interpret: bool = False):
    """Batched (fleet) twin of make_pallas_match: grid over the instance
    axis, ONE program instance per robot, each with its own pyramid tables
    VMEM-resident for its whole coarse-to-fine match (the single-instance
    kernel body is reused verbatim — block shapes match the dense case, so
    the per-instance semantics are identical by construction).

    Built fn(*tables, X [B*n_pad, 1], Y, Vf, pose0 [B, 4]) -> [B, 128] with
    per-instance (x, y, theta, solve_failures, resid_sum, n_in) in lanes 0-5.
    tables = prepare_tables_batch(...) output.  pose0 rides whole in SMEM
    (indexed by program_id); the raw kernel output is [B*8, 128] (Mosaic's
    8-sublane block floor) and is sliced back to [B, 128] here.

    The grid runs instances sequentially on the core while Pallas
    double-buffers the next instance's table DMA behind the current match —
    the serving-mode replacement for ops/gn.fused_gn_iteration_batch_onehot
    whose one-hot masks and selected planes re-materialize through HBM every
    GN iteration (docs/PERF.md round-5 fleet section for the measurement).
    """
    assert tuple(cfg.offset) == (0.0, 0.0), cfg.offset
    assert n_pad % 8 == 0, n_pad
    nl = cfg.num_levels
    kernel = functools.partial(_match_kernel, cfg, n_pad, True)

    in_specs = []
    for level in range(nl):
        in_specs.append(pl.BlockSpec(
            (_row_pad(cfg.level_sizes[level]),
             2 * level_lanes(cfg.level_sizes[level])), lambda i: (i, 0)))
    in_specs += [pl.BlockSpec((n_pad, 1), lambda i: (i, 0))] * 3
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]

    def match(*args):
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b * 8, 128), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            interpret=interpret,
        )(*args)
        return out.reshape(b, 8, 128)[:, 0]

    return match


def _match_kernel_packed(cfg, n_pad, g_pack, *refs):
    """G-packed fleet kernel body: G instances stacked on the SUBLANE axis.

    The grid-over-instances kernel (batched=True _match_kernel) measured a
    NULL result vs the XLA batched one-hot (docs/PERF.md round 5): each
    instance's 15-iteration match is an irreducibly serial dependent-op
    chain, and a sequential grid gets no cross-instance pipelining.  Here
    every op in that chain carries G instances' beams ([G*N, 1] stacks), so
    the chain length stays the same while doing G x the work:

      * per-instance scalar state (pose, H entries, solve) is [G, 1];
      * scalar -> beam broadcast is ONE [GN, G] x [G, 4] segment matmul;
      * the 11 Hessian/residual sums are ONE [G, GN] x [GN, 11] segment
        matmul (precision HIGHEST: the MXU's 3-pass f32 so the solve sees
        full-precision reductions);
      * the one-hot row matmuls stay per instance (static table-block
        slices), issued back to back so the MXU pipelines across instances.

    refs = (t0, t0s, ..., X, Y, V, pose0_smem [B, 4], out [8, 128]); table
    blocks hold G instances' padded rows contiguously ([G*wp_l, lanes_l]).
    """
    nl = cfg.num_levels
    tabs = refs[:nl]
    X_ref, Y_ref, V_ref, pose_ref, out_ref = refs[nl:]
    G = g_pack
    gn = G * n_pad

    X = X_ref[:]                       # [GN, 1] f32, G instances' beams
    Y = Y_ref[:]
    V = V_ref[:]
    g0 = pl.program_id(0) * G

    # segment matrices (iota-built, loop-invariant): seg[g, i] = 1 iff beam
    # row i belongs to instance g; segT its transpose for broadcasts
    row_of = jax.lax.broadcasted_iota(jnp.int32, (G, gn), 1) // n_pad
    seg = (row_of == jax.lax.broadcasted_iota(
        jnp.int32, (G, gn), 0)).astype(jnp.float32)
    segT = (jax.lax.broadcasted_iota(jnp.int32, (gn, G), 0) // n_pad
            == jax.lax.broadcasted_iota(
                jnp.int32, (gn, G), 1)).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def col(a, j):
        return a[:, j:j + 1]

    def gcol(v):
        """[G, 1] f32 from per-instance SMEM scalars."""
        return jnp.concatenate(
            [jnp.full((1, 1), v(gi), jnp.float32) for gi in range(G)], axis=0)

    px = gcol(lambda gi: pose_ref[g0 + gi, 0])     # [G, 1] state
    py = gcol(lambda gi: pose_ref[g0 + gi, 1])
    th = gcol(lambda gi: pose_ref[g0 + gi, 2])
    zg = jnp.zeros((G, 1), jnp.float32)
    stats = {"fails": zg, "resid": zg, "n_in": zg}

    def one_level(level, px, py, th):
        w = cfg.level_sizes[level]
        wp = _row_pad(w)
        lanes = level_lanes(w)
        scale = 1.0 / cfg.level_resolutions[level]
        t2_ref = tabs[level]            # [G*wp, 2*lanes]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, wp), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (gn, lanes), 1)

        ex = px * scale                              # [G, 1] map px
        ey = py * scale

        for _ in range(cfg.estimate_iterations[level]):
            sr = jnp.sin(th) * scale                 # [G, 1]
            cr = jnp.cos(th) * scale
            # broadcast per-instance scalars to their beam rows: one matmul
            pack = jnp.concatenate([sr, cr, ex, ey], axis=1)     # [G, 4]
            bb = jnp.dot(segT, pack, precision=hp)               # [GN, 4]
            srb, crb, exb, eyb = (col(bb, 0), col(bb, 1), col(bb, 2),
                                  col(bb, 3))
            mx = crb * X - srb * Y + exb                         # [GN, 1]
            my = srb * X + crb * Y + eyb
            ok = (V > 0.0) & (mx >= 0.0) & (mx <= w - 2) \
                & (my >= 0.0) & (my <= w - 2)
            xi = jnp.clip(mx.astype(jnp.int32), 0, w - 2)
            yi = jnp.clip(my.astype(jnp.int32), 0, w - 2)

            # per-instance one-hot row matmuls against static table slices
            rrs = []
            for gi in range(G):
                yi_g = yi[gi * n_pad:(gi + 1) * n_pad]
                oh_g = (yi_g == row_iota).astype(jnp.bfloat16)   # [N, wp]
                rrs.append(jnp.dot(oh_g, t2_ref[gi * wp:(gi + 1) * wp, :],
                                   preferred_element_type=jnp.float32))
            rr = jnp.concatenate(rrs, axis=0)             # [GN, 2*lanes]
            r0 = rr[:, :lanes]
            r1 = rr[:, lanes:]
            oh_x0 = (xi == lane_iota).astype(jnp.float32)
            oh_x1 = ((xi + 1) == lane_iota).astype(jnp.float32)
            v0 = jax.nn.sigmoid(jnp.sum(r0 * oh_x0, axis=1, keepdims=True))
            v1 = jax.nn.sigmoid(jnp.sum(r0 * oh_x1, axis=1, keepdims=True))
            v2 = jax.nn.sigmoid(jnp.sum(r1 * oh_x0, axis=1, keepdims=True))
            v3 = jax.nn.sigmoid(jnp.sum(r1 * oh_x1, axis=1, keepdims=True))

            fx = mx - xi
            fy = my - yi
            xf = 1.0 - fx
            yf = 1.0 - fy
            val = (v0 * xf + v1 * fx) * yf + (v2 * xf + v3 * fx) * fy
            gx = -((v0 - v1) * xf + (v2 - v3) * fx)
            gy = -((v0 - v2) * yf + (v1 - v3) * fy)
            z = jnp.float32(0.0)
            gx = jnp.where(ok, gx, z)
            gy = jnp.where(ok, gy, z)
            fun = jnp.where(ok, 1.0 - val, z)
            rot = (-srb * X - crb * Y) * gx + (crb * X - srb * Y) * gy
            okf = ok.astype(jnp.float32)

            # all 11 per-instance sums as ONE [G, GN] x [GN, 11] matmul
            cols = jnp.concatenate(
                [gx * fun, gy * fun, rot * fun,
                 gx * gx, gx * gy, gx * rot,
                 gy * gy, gy * rot, rot * rot,
                 fun * fun, okf], axis=1)                        # [GN, 11]
            red = jnp.dot(seg, cols, precision=hp)               # [G, 11]
            d0, d1, d2 = col(red, 0), col(red, 1), col(red, 2)
            H00, H01, H02 = col(red, 3), col(red, 4), col(red, 5)
            H11, H12, H22 = col(red, 6), col(red, 7), col(red, 8)
            if cfg.gn_damping > 0.0:
                H00 = H00 * (1.0 + cfg.gn_damping)
                H11 = H11 * (1.0 + cfg.gn_damping)
                H22 = H22 * (1.0 + cfg.gn_damping)
            a0 = H11 * H22 - H12 * H12
            a1 = H02 * H12 - H01 * H22
            a2 = H01 * H12 - H02 * H11
            det = H00 * a0 + H01 * a1 + H02 * a2
            b1 = H00 * H22 - H02 * H02
            b2 = H01 * H02 - H00 * H12
            c2 = H00 * H11 - H01 * H01
            okd = (H00 != 0.0) & (H11 != 0.0) & (det != 0.0) \
                & jnp.isfinite(det)
            inv = jnp.where(okd, 1.0 / jnp.where(det == 0.0, 1.0, det),
                            jnp.float32(0.0))
            s0 = (a0 * d0 + a1 * d1 + a2 * d2) * inv
            s1 = (a1 * d0 + b1 * d1 + b2 * d2) * inv
            if cfg.xy_step_clamp_px > 0.0:
                s0 = jnp.clip(s0, -cfg.xy_step_clamp_px, cfg.xy_step_clamp_px)
                s1 = jnp.clip(s1, -cfg.xy_step_clamp_px, cfg.xy_step_clamp_px)
            s2 = jnp.clip((a2 * d0 + b2 * d1 + c2 * d2) * inv,
                          -cfg.deriv_clamp, cfg.deriv_clamp)
            ex = ex + s0
            ey = ey + s1
            th = th + s2
            stats["fails"] = stats["fails"] + jnp.where(okd, 0.0, 1.0)
            stats["resid"] = col(red, 9)
            stats["n_in"] = col(red, 10)

        a = jnp.mod(jnp.mod(th, _TWO_PI) + _TWO_PI, _TWO_PI)
        th = jnp.where(a > jnp.pi, a - _TWO_PI, a)
        return ex / scale, ey / scale, th

    for level in range(nl - 1, -1, -1):
        px, py, th = one_level(level, px, py, th)

    # empty-scan fallback to the hint (ScanMatcher.cs:82-83), per instance
    any_valid = jnp.dot(seg, V, precision=hp) > 0.0              # [G, 1]
    px = jnp.where(any_valid, px, gcol(lambda gi: pose_ref[g0 + gi, 0]))
    py = jnp.where(any_valid, py, gcol(lambda gi: pose_ref[g0 + gi, 1]))
    th = jnp.where(any_valid, th, gcol(lambda gi: pose_ref[g0 + gi, 2]))

    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
    out = jnp.where(lane == 0, px, jnp.where(lane == 1, py,
                    jnp.where(lane == 2, th,
                    jnp.where(lane == 3, stats["fails"],
                    jnp.where(lane == 4, stats["resid"],
                    jnp.where(lane == 5, stats["n_in"],
                              jnp.float32(0.0)))))))
    if G < 8:                       # out block is one (8, 128) sublane tile
        out = jnp.concatenate([out, jnp.zeros((8 - G, 128), jnp.float32)],
                              axis=0)
    out_ref[:] = out


def make_pallas_match_packed(cfg, n_pad: int, b: int, g_pack: int = 4,
                             interpret: bool = False):
    """Packed fleet matcher: grid of B/G programs, G instances per program
    stacked on sublanes (_match_kernel_packed).  fn(*tables, X [B*n_pad, 1],
    Y, Vf, pose0 [B, 4]) -> [B, 128], lanes 0-5 as make_pallas_match.

    g_pack bounds VMEM: per program the resident tables are g_pack x the
    single-instance ~1.1 MB (bf16, 3-level 400 pyramid) plus [G*N, lanes]
    intermediates — G=4 fits v5e's ~16 MB with double buffering; G=8 does
    not at map_size=400."""
    assert tuple(cfg.offset) == (0.0, 0.0), cfg.offset
    assert n_pad % 8 == 0, n_pad
    assert g_pack in (1, 2, 4, 8), g_pack
    assert b % g_pack == 0, (b, g_pack)
    nl = cfg.num_levels
    kernel = functools.partial(_match_kernel_packed, cfg, n_pad, g_pack)

    in_specs = []
    for level in range(nl):
        in_specs.append(pl.BlockSpec(
            (g_pack * _row_pad(cfg.level_sizes[level]),
             2 * level_lanes(cfg.level_sizes[level])), lambda i: (i, 0)))
    in_specs += [pl.BlockSpec((g_pack * n_pad, 1), lambda i: (i, 0))] * 3
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    n_prog = b // g_pack

    def match(*args):
        out = pl.pallas_call(
            kernel,
            grid=(n_prog,),
            out_shape=jax.ShapeDtypeStruct((n_prog * 8, 128), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            interpret=interpret,
        )(*args)
        return out.reshape(n_prog, 8, 128)[:, :g_pack].reshape(b, 128)

    return match


def make_pallas_match(cfg, n_pad: int, interpret: bool = False):
    """Build match_fn(*tables, X [N,1], Y [N,1], Vf [N,1], pose0 [1,4])
    -> [1, 128] with (x, y, theta, solve_failures, resid_sum, n_in) in
    lanes 0-5.

    tables = prepare_tables(...) output; n_pad = padded beam count
    (multiple of 8 sublanes)."""
    assert tuple(cfg.offset) == (0.0, 0.0), cfg.offset
    assert n_pad % 8 == 0, n_pad
    nl = cfg.num_levels
    kernel = functools.partial(_match_kernel, cfg, n_pad, False)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * nl
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                + [pl.BlockSpec((1, 4), memory_space=pltpu.SMEM)])

    def match(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)

    return match
