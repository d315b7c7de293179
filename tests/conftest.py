import os
import sys

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. Must be set before jax is imported anywhere.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
