"""Batched particle SLAM — a TPU-only layer with no reference counterpart.

BASELINE.json config 4: "8k-particle vmapped CoreSLAM scoring + top-k refine on
one chip".  Where CoreSLAM perturbs one search pose (CoreSLAMProcessor.cs:624-653),
this layer maintains a persistent population of P pose hypotheses:

  1. propagate: every particle moves by the odometry delta + motion noise;
  2. score:     ONE fused score_candidates call over all P particles
                (the same kernel as the Monte-Carlo search — P2 scaled up);
  3. refine:    the top-k particles each spawn R local perturbations, scored in
                a second fused [k*R] batch; each survivor keeps its best;
  4. estimate:  the best refined particle;
  5. resample:  systematic resampling from softmax(-score/T) when the effective
                sample size drops below the configured fraction;
  6. map:       hole/obstacle maps updated at the estimate (same kernels as
                models.coreslam).

Everything is fixed-shape and fused; a scan step is one jitted program.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import CoreSlamConfig, ParticleConfig
from ..core.geometry import normalize_angle
from ..core.scan import Scan
from ..ops import holemap, obstacle, score
from . import coreslam


class ParticleState(NamedTuple):
    particles: jnp.ndarray      # f32[P, 3]
    scores: jnp.ndarray         # i32[P] — last scan's pixel sums (lower=better)
    hole_map: jnp.ndarray       # i32[S*S]
    obstacle_map: jnp.ndarray   # i8[OS, OS]
    pose: jnp.ndarray           # f32[3] current best estimate
    last_odometry: jnp.ndarray  # f32[3]
    scan_count: jnp.ndarray     # i32[]
    key: jnp.ndarray


class ParticleInfo(NamedTuple):
    best_sum: jnp.ndarray       # i32
    ess: jnp.ndarray            # f32 effective sample size
    resampled: jnp.ndarray      # bool


def init(ccfg: CoreSlamConfig, pcfg: ParticleConfig, start_pose,
         key=None) -> ParticleState:
    if key is None:
        key = jax.random.PRNGKey(0)
    s = ccfg.hole_map_size
    os_ = ccfg.obstacle_map_size
    start = jnp.asarray(start_pose, jnp.float32)
    return ParticleState(
        particles=jnp.tile(start[None], (pcfg.num_particles, 1)),
        scores=jnp.zeros(pcfg.num_particles, jnp.int32),
        hole_map=jnp.full((s * s,), coreslam.HOLE_INIT, jnp.int32),
        obstacle_map=jnp.full((os_, os_), ccfg.unmapped_obstacle_hits, jnp.int8),
        pose=start,
        last_odometry=jnp.zeros(3, jnp.float32),
        scan_count=jnp.zeros((), jnp.int32),
        key=key,
    )


def _score(state, cfg: CoreSlamConfig, cloud: Scan, poses):
    sums, nb = score.score_candidates(state.hole_map, cfg.hole_map_size,
                                      cfg.hole_scale, cloud.points, cloud.valid,
                                      poses)
    return jnp.where(nb > 0, sums, score.INT32_MAX)


def update(state: ParticleState, cloud: Scan, odometry_pose,
           ccfg: CoreSlamConfig,
           pcfg: ParticleConfig) -> Tuple[ParticleState, ParticleInfo]:
    odo = jnp.asarray(odometry_pose, jnp.float32)
    key, k_prop, k_ref, k_res = jax.random.split(state.key, 4)
    p = pcfg.num_particles

    # 1. propagate with the odometry delta prior (CoreSLAMProcessor.cs:728)
    delta = odo - state.last_odometry
    noise_xy = jax.random.normal(k_prop, (p, 2)) * ccfg.sigma_xy
    noise_th = jax.random.normal(jax.random.fold_in(k_prop, 1), (p, 1)) \
        * ccfg.sigma_theta
    prop = state.particles + delta[None, :] + jnp.concatenate(
        [noise_xy, noise_th], axis=1)
    # particle 0 carries the unperturbed prior
    prop = prop.at[0].set(state.pose + delta)

    # 2. score the whole population in one fused batch
    eff = _score(state, ccfg, cloud, prop)

    # 3. top-k refine: k survivors x R local perturbations
    k = pcfg.top_k
    r = pcfg.refine_candidates
    neg, top_idx = jax.lax.top_k(-eff, k)
    survivors = prop[top_idx]                                   # [k, 3]
    loc_xy = jax.random.normal(k_ref, (k, r, 2)) * (ccfg.sigma_xy * 0.3)
    loc_th = jax.random.normal(jax.random.fold_in(k_ref, 1), (k, r, 1)) \
        * (ccfg.sigma_theta * 0.3)
    local = jnp.concatenate([loc_xy, loc_th], axis=-1)
    local = local.at[:, 0].set(0.0)                             # keep original
    refine_poses = (survivors[:, None, :] + local).reshape(k * r, 3)
    ref_eff = _score(state, ccfg, cloud, refine_poses).reshape(k, r)
    best_r = jnp.argmin(ref_eff, axis=1)
    refined = refine_poses.reshape(k, r, 3)[jnp.arange(k), best_r]  # [k, 3]
    refined_eff = ref_eff[jnp.arange(k), best_r]

    # 4. estimate = best refined survivor
    b = jnp.argmin(refined_eff)
    best_pose = refined[b]
    best_pose = best_pose.at[2].set(normalize_angle(best_pose[2]))
    best_sum = refined_eff[b]

    # write refined survivors back into the population
    particles = prop.at[top_idx].set(refined)
    eff = eff.at[top_idx].set(refined_eff)

    # 5. resample when the effective sample size collapses
    valid_n = jnp.maximum(jnp.sum(cloud.valid), 1)
    # temperature ~ score scale: one map-value unit averaged over the cloud
    t = 2000.0 * valid_n.astype(jnp.float32)
    logw = -eff.astype(jnp.float32) / t
    w = jax.nn.softmax(logw)
    ess = 1.0 / jnp.sum(w * w)
    do_resample = ess < pcfg.resample_ess_frac * p

    u = (jax.random.uniform(k_res) + jnp.arange(p)) / p         # systematic
    cdf = jnp.cumsum(w)
    idx = jnp.searchsorted(cdf, u)
    idx = jnp.clip(idx, 0, p - 1)
    particles = jnp.where(do_resample, particles[idx], particles)
    eff = jnp.where(do_resample, eff[idx], eff)

    # 6. map updates at the estimate (during warmup, trust odometry — the
    #    coreslam PositionSearchBeginning contract)
    warm = state.scan_count >= ccfg.position_search_beginning
    est = jnp.where(warm, best_pose, odo)
    # during warmup the population tracks the odometry estimate directly, so the
    # (meaningless) first odometry delta cannot seed a runaway population
    particles = jnp.where(warm, particles,
                          jnp.broadcast_to(est, particles.shape))
    hole = holemap.update_hole_map(state.hole_map, ccfg.hole_map_size,
                                   ccfg.hole_scale, cloud.points, cloud.valid,
                                   est, ccfg.hole_width, ccfg.quality)
    obst = obstacle.update_obstacle_map(state.obstacle_map,
                                        ccfg.obstacle_map_size,
                                        ccfg.obstacle_scale, cloud.points,
                                        cloud.valid, est, ccfg.max_obstacle_hits)

    new_state = ParticleState(
        particles=particles, scores=eff, hole_map=hole, obstacle_map=obst,
        pose=est, last_odometry=odo,
        scan_count=jnp.where(warm, state.scan_count, state.scan_count + 1),
        key=key)
    return new_state, ParticleInfo(best_sum=best_sum, ess=ess,
                                   resampled=do_resample)
