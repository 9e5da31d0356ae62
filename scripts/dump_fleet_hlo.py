#!/usr/bin/env python
"""Dump the compiled (post-optimization) TPU HLO of the fleet matcher-only
replay and summarize suspicious ops: big copies/transposes, gather shapes,
fusion count inside the scan body.  Compile-only — no timing, immune to the
tunnel's run-to-run variance.
"""
import collections
import re
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slamnet_tpu.core import HectorConfig
    from slamnet_tpu.models import fleet

    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4),
                       xy_step_clamp_px=10.0, match_subsample=4)
    B, T, N = 64, 8, 512
    rng = np.random.default_rng(0)
    states = fleet.init_fleet(cfg, np.tile(
        np.asarray([20.0, 20.0, 0.0], np.float32), (B, 1)))
    radii = jnp.asarray(rng.uniform(2.0, 20.0, (T, B, N)), jnp.float32)
    valids = jnp.ones((T, B, N), bool)
    angles = jnp.asarray(np.linspace(0, 2 * np.pi, N, endpoint=False),
                         jnp.float32)
    cells = fleet.fleet_cells(cfg)

    def match_only(states, radii, valids):
        def body(sts, inp):
            r, v = inp
            pts = jnp.stack([r * jnp.cos(angles)[None, :],
                             r * jnp.sin(angles)[None, :]], -1)
            matched, _ = fleet._match_batch(sts.maps, cells, pts, v,
                                            sts.match_pose, cfg)
            sts = sts._replace(match_pose=matched)
            return sts, matched
        return jax.lax.scan(body, states, (radii, valids))

    print("lowering + compiling...", flush=True)
    compiled = jax.jit(match_only).lower(states, radii, valids).compile()
    txt = compiled.as_text()
    out = "/tmp/fleet_match_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {out}")

    # summarize: op kinds and big-shape copies
    op_re = re.compile(r"^\s*(?:ROOT )?%?[\w.-]+ = (\w+)\[([\d,]*)\]", re.M)
    kinds = collections.Counter()
    big = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.-]+ = [a-z0-9]+\[([\d,]*)\][^ ]* (\w+)\(", txt, re.M):
        shape, kind = m.group(1), m.group(2)
        kinds[kind] += 1
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        if n >= 1_000_000 and kind in ("copy", "transpose", "bitcast",
                                       "reshape", "gather", "scatter",
                                       "dynamic-slice", "dynamic-update-slice",
                                       "all-gather", "convert"):
            big[f"{kind} [{shape}]"] += 1
    print("\ntop op kinds:")
    for k, c in kinds.most_common(25):
        print(f"  {k:24s} {c}")
    print("\nbig (>=1M elem) data-movement ops:")
    for k, c in big.most_common(30):
        print(f"  {k:48s} x{c}")


if __name__ == "__main__":
    main()
