"""Pallas scatter kernel (interpret mode) vs the XLA order-independent update."""
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.ops.pallas_scatter import occupancy_scatter_pallas


def test_pallas_scatter_matches_xla_semantics():
    C = 2048
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.normal(0, 1, C), jnp.float32)
    P, E = 700, 90
    flat = jnp.asarray(rng.integers(0, C, P), jnp.int32)
    fmask = jnp.asarray(rng.random(P) > 0.3)
    oflat = jnp.asarray(rng.integers(0, C, E), jnp.int32)
    omask = jnp.asarray(rng.random(E) > 0.2)
    lof, loo, cap = -0.4, 2.2, 50.0

    got = np.asarray(occupancy_scatter_pallas(maps, flat, fmask, oflat, omask,
                                              lof, loo, cap, interpret=True))

    m = np.zeros(C, np.int32)
    m[np.asarray(flat)[np.asarray(fmask)]] = 1
    m[np.asarray(oflat)[np.asarray(omask)]] = 2   # occ wins
    v = np.asarray(maps)
    want = (v + np.where(m == 1, lof, 0.0)
            + np.where((m == 2) & (v < cap), loo, 0.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_scatter_cap_rule():
    C = 256
    maps = jnp.full(C, 60.0, jnp.float32)          # above the 50 cap
    oflat = jnp.asarray([5], jnp.int32)
    got = np.asarray(occupancy_scatter_pallas(
        maps, jnp.zeros(8, jnp.int32), jnp.zeros(8, bool), oflat,
        jnp.ones(1, bool), -0.4, 2.2, 50.0, interpret=True))
    assert got[5] == 60.0                           # capped: no increment
