#!/usr/bin/env python
"""Generate the checked-in CARMEN sample log (examples/data/sim_loop.clf):
120 scans x 180 beams over the default field with noisy integrated odometry.
Run from the repo root; deterministic (seed 0)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from slamnet_tpu.io import datasets  # noqa: E402


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "data", "sim_loop.clf")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    log = datasets.simulate_carmen_log(n_scans=120, num_beams=180)
    datasets.write_carmen(out, log)
    print(f"wrote {out}: {log.ranges.shape[0]} scans x "
          f"{log.ranges.shape[1]} beams")


if __name__ == "__main__":
    main()
