import os
import pathlib
import sys

# Multi-chip tests run on a virtual CPU mesh; the real-TPU bench path sets
# its own platform. Tests must not grab the TPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"
GOLDEN_SAN = REPO / "tests" / "golden_sanitized"
DATA = REPO / "tests" / "data"
