"""Multi-device tests on the virtual 8-device CPU mesh: sharded kernels must be
semantically identical to their single-device counterparts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from slamnet_tpu.ops import gn, logodds, score
from slamnet_tpu.parallel import hessian, make_mesh, search, tiles

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_search_matches_reference_semantics():
    mesh = make_mesh({"search": 8})
    size, scale = 64, 1.6
    rng = np.random.default_rng(0)
    hole = jnp.asarray(rng.integers(0, 65500, size * size), jnp.int32)
    pts = jnp.asarray(rng.uniform(-10, 10, (128, 2)), jnp.float32)
    valid = jnp.ones(128, bool)
    pose = jnp.asarray([20.0, 20.0, 0.1], jnp.float32)

    best, gmin = search.sharded_monte_carlo_search(
        mesh, hole, size, scale, pts, valid, pose, 0.1, 0.1, 1024,
        jax.random.PRNGKey(3))
    # the returned pose must actually score gmin
    sums, nb = score.score_candidates(hole, size, scale, pts, valid,
                                      best[None])
    assert int(sums[0]) == int(gmin)
    # and must beat (or tie) the unperturbed pose
    s0, _ = score.score_candidates(hole, size, scale, pts, valid, pose[None])
    assert int(gmin) <= int(s0[0])


def test_sharded_search_equals_dense_same_candidates():
    """The sharded search must equal a single-device argmin over the SAME
    candidate set.  Candidate generation is deterministic (per-shard key =
    fold_in(key, shard_idx), shard 0's first candidate unperturbed), so the
    global set can be rebuilt densely: concatenating the per-shard draws in
    shard order makes first-shard-wins == first-index-wins."""
    mesh = make_mesh({"search": 8})
    size, scale = 64, 1.6
    rng = np.random.default_rng(7)
    hole = jnp.asarray(rng.integers(0, 65500, size * size), jnp.int32)
    pts = jnp.asarray(rng.uniform(-10, 10, (128, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(128) > 0.1)
    pose = jnp.asarray([20.0, 20.0, 0.1], jnp.float32)
    num_candidates, n_shards = 1024, 8
    sigma_xy, sigma_theta = 0.1, 0.1
    key = jax.random.PRNGKey(11)

    best, gmin = search.sharded_monte_carlo_search(
        mesh, hole, size, scale, pts, valid, pose, sigma_xy, sigma_theta,
        num_candidates, key)

    # rebuild the identical global candidate set on one device
    local_b = num_candidates // n_shards
    shard_cands = []
    for idx in range(n_shards):
        kxy, kth = jax.random.split(jax.random.fold_in(key, idx))
        dxy = jax.random.normal(kxy, (local_b, 2)) * sigma_xy
        dth = jax.random.normal(kth, (local_b, 1)) * sigma_theta
        deltas = jnp.concatenate([dxy, dth], axis=1)
        if idx == 0:
            deltas = deltas.at[0].set(0.0)
        shard_cands.append(pose[None, :] + deltas)
    cands = jnp.concatenate(shard_cands, axis=0)

    sums, nb = score.score_candidates(hole, size, scale, pts, valid, cands)
    eff = np.where(np.asarray(nb) > 0, np.asarray(sums), score.INT32_MAX)
    bi = int(np.argmin(eff))
    assert int(gmin) == int(eff[bi])
    np.testing.assert_array_equal(np.asarray(best), np.asarray(cands[bi]))


def test_sharded_hessian_equals_dense():
    mesh = make_mesh({"beam": 8})
    width = 64
    rng = np.random.default_rng(1)
    lo = jnp.asarray(rng.normal(0, 1, width * width), jnp.float32)
    pts = jnp.asarray(rng.uniform(-3, 3, (128, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(128) > 0.2)
    pose = jnp.asarray([32.0, 32.0, 0.3], jnp.float32)

    H, dtr = hessian.sharded_hessian_derivs(mesh, lo, width, pts, valid, pose,
                                            10.0)
    Hd, dtrd = gn.hessian_derivs(lo, width, pts, valid, pose, 10.0)
    np.testing.assert_allclose(np.asarray(H), np.asarray(Hd), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dtr), np.asarray(dtrd), rtol=1e-5,
                               atol=1e-5)


def _tiled_setup(mesh, width=64, n=96, seed=2):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.normal(0, 1, (width, width)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-3, 3, (n, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.1)
    return grid, pts, valid


def test_tiled_hessian_equals_dense():
    mesh = make_mesh({"tile": 8})
    width = 64
    grid, pts, valid = _tiled_setup(mesh, width)
    rows = width // 8
    pose = jnp.asarray([32.0, 32.0, -0.2], jnp.float32)

    stacked = tiles.shard_grid(mesh, grid)

    def run(local, pts, valid, pose):
        return tiles.tiled_hessian_derivs_local(local[0], width, rows, pts,
                                                valid, pose, 10.0, "tile")

    fn = shard_map(run, mesh=mesh, in_specs=(P("tile"), P(), P(), P()),
                   out_specs=(P(), P()))
    H, dtr = fn(stacked, pts, valid, pose)
    Hd, dtrd = gn.hessian_derivs(grid.reshape(-1), width, pts, valid, pose, 10.0)
    np.testing.assert_allclose(np.asarray(H), np.asarray(Hd), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dtr), np.asarray(dtrd), rtol=1e-5,
                               atol=1e-5)


def test_tiled_occupancy_update_equals_dense():
    mesh = make_mesh({"tile": 8})
    width = 64
    grid, pts, valid = _tiled_setup(mesh, width, seed=5)
    rows = width // 8
    pose = jnp.asarray([20.0, 20.0, 0.4], jnp.float32)
    scan_pose = jnp.zeros(2, jnp.float32)
    lof, loo = -0.405465, 2.19722

    stacked = tiles.shard_grid(mesh, grid)

    def run(local, pts, valid, pose, scan_pose):
        out = tiles.tiled_occupancy_update_local(
            local[0], width, rows, pts, valid, pose, scan_pose, 1.6, lof, loo,
            "tile")
        return out[None]

    fn = shard_map(run, mesh=mesh, in_specs=(P("tile"), P(), P(), P(), P()),
                   out_specs=P("tile"))
    out = fn(stacked, pts, valid, pose, scan_pose)
    got = np.asarray(tiles.unshard_grid(out))

    want = np.asarray(logodds.update_occupancy(
        grid.reshape(-1), width, pts, valid, pose, scan_pose, 1.6, lof, loo
    )).reshape(width, width)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # halo invariant: tile t's halo row == tile t+1's first owned row
    out_np = np.asarray(out)
    for t in range(7):
        np.testing.assert_allclose(out_np[t, -1], out_np[t + 1, 0], atol=1e-6)


def test_shard_unshard_roundtrip():
    mesh = make_mesh({"tile": 8})
    grid = jnp.arange(64 * 8, dtype=jnp.float32).reshape(64, 8)
    stacked = tiles.shard_grid(mesh, grid)
    back = np.asarray(tiles.unshard_grid(stacked))
    np.testing.assert_array_equal(back, np.asarray(grid))
