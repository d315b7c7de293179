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
    # The XLA:CPU persistent compilation cache is DISABLED by default here:
    # executable serialize/deserialize segfaulted two round-3 full-suite
    # runs (once in compilation_cache.get_executable_and_time, once in
    # put_executable_and_time), and cache loads on this machine warn about
    # a compile-vs-host machine-feature mismatch ("+prefer-no-gather ...
    # could lead to execution errors such as SIGILL"). Recompiling every
    # run is slower but deterministic. For local dev iteration, opt back
    # in with WT_TEST_CACHE=1 (accepting the nondeterministic crash risk).
    if os.environ.get("WT_TEST_CACHE") == "1":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache_cpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except ImportError:  # host-only layers do not need jax
    pass
