"""Debug / sanitizer mode — the framework's stand-in for race detectors.

SURVEY.md §5.2: JAX's functional purity removes data races by construction;
what remains is (a) bitwise determinism given a PRNG key (tested in
tests/test_compat.py) and (b) numeric sanity.  This module wires
jax.experimental.checkify so any pipeline step can run with NaN/inf and
out-of-bounds index checks in debug builds, plus a cheap state validator for
production monitors.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap a jittable step with float (NaN/inf) + index checks.

    Returns a function with the same signature that RAISES on the first
    numeric error instead of propagating garbage.  Debug-mode only — checks
    cost throughput.
    """
    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every float leaf of the state pytree is finite.

    Cheap enough for a per-scan production monitor (pair it with
    io.metrics.DivergenceMonitor for the full failure-detection story).
    """
    leaves = [l for l in jax.tree.leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    flags = [jnp.all(jnp.isfinite(l)) for l in leaves]
    return jnp.stack(flags).all()
