"""Debug mode: checkify NaN detection, finite-state monitor, profiler no-crash."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamnet_tpu.core import debug
from slamnet_tpu.io import metrics
from slamnet_tpu.models import hector
from slamnet_tpu.core import HectorConfig


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)          # NaN for negative input

    f = debug.checked(bad)
    out = f(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), np.log([1.0, 2.0]), rtol=1e-6)
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_all_finite_monitor():
    cfg = HectorConfig(num_levels=1, map_size=32, estimate_iterations=(1,))
    st = hector.init(cfg, (0.0, 0.0, 0.0))
    assert bool(debug.all_finite(st))
    bad = st._replace(maps=st.maps.at[0].set(jnp.nan))
    assert not bool(debug.all_finite(bad))


def test_device_trace_noop_safe(tmp_path):
    with metrics.device_trace(str(tmp_path / "trace")):
        x = jnp.ones(8) * 2
        jax.block_until_ready(x)
