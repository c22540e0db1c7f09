import os
import pathlib
import sys

# Multi-chip tests run on a virtual CPU mesh; the real-TPU bench path sets
# its own platform. Tests must not grab the TPU (the environment may preset
# JAX_PLATFORMS to the tunnel platform, so force, don't setdefault).
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
# The env var alone does not win over a preset tunnel platform plugin; the
# config knob does.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"
GOLDEN_SAN = REPO / "tests" / "golden_sanitized"
DATA = REPO / "tests" / "data"
