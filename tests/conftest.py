"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-device sharding tests run on the virtual devices; numerics tests are
platform-agnostic. (Real-TPU benchmarking happens via bench.py, not pytest.)
"""

import os
import sys

# The machine's sitecustomize (PYTHONPATH=/root/.axon_site, gated on
# PALLAS_AXON_POOL_IPS) registers the remote-TPU relay in EVERY interpreter
# BEFORE conftest runs: imports stall minutes under contention and CPU test
# compiles get routed through the relay's remote-compile HTTP service.
# Re-exec pytest once with a sanitized environment so the suite runs purely
# local regardless of how it was invoked.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_IR_TESTS_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ""
    env["_IR_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # pytest's fd-level global capture is already active while initial
    # conftests load, so fd 1/2 currently point at capture tempfiles; the
    # exec'd process would inherit them and its output would vanish.
    # Restore the real stdout/stderr fds first.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for _obj in gc.get_objects():
            if isinstance(_obj, CaptureManager):
                _obj.stop_global_capturing()
    except Exception:
        pass
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
# neutralize the axon remote-compile hook for CPU test compiles (belt &
# braces with the re-exec above)
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache so repeated suite runs skip CPU compiles
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)
