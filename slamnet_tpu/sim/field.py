"""Headless simulated field: polygon world + vmapped ray casting.

JAX replacement for the reference's Box2D-backed Simulation/Field.cs: the world is a
set of line segments (edges); ray tracing is a closed-form ray/segment intersection
vmapped over (rays x edges), replacing World.RayCast (Field.cs:162-182).  The default
field reproduces CreateDefaultField's exact vertex lists (Field.cs:43-72): a concave
12-vertex outer wall and a 4-vertex inner obstacle, scale 30, offset (5,5) as
instantiated by MainWindow.xaml.cs:97.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CreateDefaultField vertex lists (Simulation/Field.cs:45-69), unit square scaled.
OUTER_VERTICES = np.array(
    [
        [0.00, 0.0], [1.00, 0.0], [1.00, 0.2], [0.80, 0.3],
        [0.80, 0.5], [1.00, 0.4], [1.00, 1.0], [0.60, 1.0],
        [0.60, 0.8], [0.50, 0.8], [0.50, 1.0], [0.00, 1.0],
    ],
    dtype=np.float32,
)
INNER_VERTICES = np.array(
    [[0.2, 0.3], [0.3, 0.3], [0.4, 0.7], [0.3, 0.7]], dtype=np.float32
)


class Field(NamedTuple):
    """Edge soup: segments from a[i] to b[i], both f32[E, 2] (meters)."""

    a: jnp.ndarray
    b: jnp.ndarray

    @property
    def num_edges(self) -> int:
        return self.a.shape[0]


def _closed_loop_edges(vertices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Closed polyline -> edge endpoint arrays (AddEdges(closeLoop=True), Field.cs:79-116)."""
    a = vertices
    b = np.roll(vertices, -1, axis=0)
    return a, b


def make_field(polygons: Sequence[np.ndarray], scale: float = 1.0,
               offset: Tuple[float, float] = (0.0, 0.0)) -> Field:
    """Build a field from closed polygons (each f32[V, 2] in unit coords)."""
    off = np.asarray(offset, np.float32)
    aa, bb = [], []
    for poly in polygons:
        a, b = _closed_loop_edges(np.asarray(poly, np.float32) * scale + off)
        aa.append(a)
        bb.append(b)
    return Field(jnp.asarray(np.concatenate(aa)), jnp.asarray(np.concatenate(bb)))


def default_field(scale: float = 30.0, offset: Tuple[float, float] = (5.0, 5.0)) -> Field:
    """The reference's default field (Field.cs:43-72 @ MainWindow.xaml.cs:97)."""
    return make_field([OUTER_VERTICES, INNER_VERTICES], scale, offset)


def ray_cast(field: Field, origin, angles, max_dist) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cast rays from `origin` f32[2] at `angles` f32[R]; return (hit bool[R], dist f32[R]).

    Closest-hit semantics of Field.RayTrace (Field.cs:162-182): the minimum hit
    fraction over all edges, distance = fraction * max_dist; no hit -> dist 0.
    Fully vectorized over rays x edges (no Box2D broadphase needed at this scale).
    """
    origin = jnp.asarray(origin, jnp.float32)
    angles = jnp.asarray(angles, jnp.float32)
    d = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)  # [R, 2]

    e = field.b - field.a                      # [E, 2] edge vectors
    ao = origin[None, :] - field.a             # [E, 2]

    # Solve origin + t*d = a + u*e for each (ray, edge):
    #   cross(d, e) * t = cross(ao_to?, ...) — standard 2D ray/segment intersection.
    denom = d[:, None, 0] * (-e[None, :, 1]) - d[:, None, 1] * (-e[None, :, 0])  # [R, E]
    # t = cross(a - o, -e) / cross(d, -e); u = cross(d, a - o) / cross(d, -e)
    t_num = (-ao[None, :, 0]) * (-e[None, :, 1]) - (-ao[None, :, 1]) * (-e[None, :, 0])
    u_num = d[:, None, 0] * (-ao[None, :, 1]) - d[:, None, 1] * (-ao[None, :, 0])

    safe = jnp.abs(denom) > 1e-12
    t = jnp.where(safe, t_num / jnp.where(safe, denom, 1.0), jnp.inf)
    u = jnp.where(safe, u_num / jnp.where(safe, denom, 1.0), -1.0)

    # t is in meters because d is unit length; accept t in [0, max_dist].
    valid = safe & (u >= 0.0) & (u <= 1.0) & (t >= 0.0) & (t <= max_dist)
    t = jnp.where(valid, t, jnp.inf)

    best = jnp.min(t, axis=1)                  # [R]
    hit = jnp.isfinite(best)
    return hit, jnp.where(hit, best, 0.0)


ray_cast_batch = jax.vmap(ray_cast, in_axes=(None, 0, 0, None))
