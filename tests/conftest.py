import os

# Tests run on the CPU backend with a virtual 8-device mesh so sharding and
# multi-chip code paths are exercised without TPU hardware (SURVEY.md section 4).
# Forced (not setdefault): the ambient environment may pin JAX_PLATFORMS to a
# TPU plugin (and plugin bootstrap code may force jax.config.jax_platforms at
# interpreter start), and hardware tests belong in bench.py, not the unit
# suite.  HSRK_TPU_LANE=1 keeps the ambient TPU backend so the
# @pytest.mark.tpu compiled-kernel lane (test_tpu_compiled.py) can run on
# the bench box:  HSRK_TPU_LANE=1 pytest tests/test_tpu_compiled.py -m tpu
_TPU_LANE = os.environ.get("HSRK_TPU_LANE") == "1"
if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_LANE and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles dominate test wall-time on this
# 2-core host; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
