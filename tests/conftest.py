"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process, which
pytest guarantees by importing conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF off any accelerator and quiet.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# The axon TPU plugin registers itself from sitecustomize and overrides the
# platform selection, so pin it back to CPU explicitly after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Same PRNG stream as production (utils/jax_setup.py): the partitionable
# threefry shards cleanly across a mesh (perf-neutral on-chip).
jax.config.update("jax_threefry_partitionable", True)
