import os
import sys

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. The ambient environment pins
# JAX_PLATFORMS=axon (the TPU tunnel) via sitecustomize, so overriding the env
# var is not enough — force the platform through jax.config after import.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # host-only layers do not need jax
    pass
