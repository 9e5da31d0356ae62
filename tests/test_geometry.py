"""Unit tests for core geometry against hand-computed values and the reference's
MathEx semantics (BaseSLAM/MathEx.cs)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from slamnet_tpu.core import geometry as g


def test_normalize_angle_range_and_values():
    # (-pi, pi] contract of MathEx.NormalizeAngle (MathEx.cs:128-138)
    xs = np.linspace(-25.0, 25.0, 1001, dtype=np.float32)
    out = np.asarray(g.normalize_angle(jnp.asarray(xs)))
    assert np.all(out <= math.pi + 1e-6) and np.all(out > -math.pi - 1e-6)
    # equivalent angle
    np.testing.assert_allclose(np.cos(out), np.cos(xs), atol=1e-5)
    np.testing.assert_allclose(np.sin(out), np.sin(xs), atol=1e-5)
    assert float(g.normalize_angle(jnp.float32(math.pi))) == pytest.approx(math.pi, abs=1e-6)
    assert float(g.normalize_angle(jnp.float32(3 * math.pi / 2))) == pytest.approx(-math.pi / 2, abs=1e-5)


def test_rad_diff_signed_wrap():
    # C# RadDiff formula (MathEx.cs:94-98)
    assert float(g.rad_diff(0.1, -0.1)) == pytest.approx(0.2, abs=1e-6)
    assert float(g.rad_diff(-3.0, 3.0)) == pytest.approx(2 * math.pi - 6.0, abs=1e-5)
    assert float(g.rad_diff(3.0, -3.0)) == pytest.approx(-(2 * math.pi - 6.0), abs=1e-5)


def test_deg_diff_matches_reference_formula():
    # spot values from the formula in MathEx.cs:69-73
    assert float(g.deg_diff(10.0, 350.0)) == pytest.approx(20.0, abs=1e-4)
    assert float(g.deg_diff(350.0, 10.0)) == pytest.approx(-20.0, abs=1e-4)
    assert float(g.deg_diff(180.0, 0.0)) == pytest.approx(-180.0, abs=1e-4)  # signed edge


def test_transform_points_matches_manual():
    pts = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    pose = jnp.asarray([3.0, 4.0, math.pi / 2])
    out = np.asarray(g.transform_points(pts, pose))
    np.testing.assert_allclose(out, [[3.0, 5.0], [1.0, 4.0]], atol=1e-5)


def test_pose_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    ab = g.pose_compose(a, b)
    rel = g.pose_between(a, ab)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(b), atol=1e-4)
    ident = g.pose_compose(a, g.pose_inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-4)


def test_csharp_trunc_toward_zero():
    xs = jnp.asarray([-1.7, -0.3, -0.0, 0.0, 0.49, 0.5, 1.99])
    np.testing.assert_array_equal(np.asarray(g.csharp_trunc(xs)), [-1, 0, 0, 0, 0, 0, 1])


def test_dotnet_round_half_even():
    xs = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5, 2.4, 2.6])
    np.testing.assert_array_equal(np.asarray(g.dotnet_round(xs)), [0, 2, 2, 0, -2, 2, 3])


def test_polar_to_cartesian():
    out = np.asarray(g.polar_to_cartesian(jnp.asarray(2.0), jnp.asarray(math.pi / 2)))
    np.testing.assert_allclose(out, [0.0, 2.0], atol=1e-6)
