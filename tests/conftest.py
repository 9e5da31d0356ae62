"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths (parallel/, graph/) are exercised on CPU via
``xla_force_host_platform_device_count`` per SURVEY.md §4 — no TPUs needed in CI.

Note: this environment's sitecustomize forces ``JAX_PLATFORMS=axon`` (a tunneled
TPU backend) before any test code runs, so the env var alone is not enough —
``jax.config.update`` after import is authoritative.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compilation cache: the suite's wall clock is dominated by XLA
# CPU compiles of the same programs every run (~30 min cold); cached
# executables cut reruns to minutes.  Separate dir from the TPU bench cache
# (.jax_cache) only by key — the cache keys on backend + HLO, so sharing the
# directory is safe.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got %s" % jax.devices())
