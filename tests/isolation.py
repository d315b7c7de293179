"""Run a crash-prone device byte-pin in a fresh interpreter.

XLA:CPU segfaults nondeterministically inside LONG pytest processes on the
largest limb-engine programs — observed on the persistent-cache
serialize/deserialize paths in round 3 AND in plain `backend_compile_and_load`
(no cache involved) in round 4, always on tests that pass standalone every
time.  Isolating each such byte-pin in a child process turns a would-be
suite-killing crash into an ordinary test failure.

The child opts into the persistent .jax_cache_cpu only when WT_TEST_CACHE=1
(same policy as conftest); if a cached child dies on a signal it is retried
once cache-less before failing.
"""

from __future__ import annotations

import os
import subprocess
import sys


def run_isolated(module: str, func: str, ok_token: str,
                 timeout: int = 3600) -> None:
    """Execute ``tests.<module>.<func>()`` in a fresh interpreter (CPU
    backend, virtual 8-device mesh) and assert it printed ``ok_token``."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    })
    cache_cfg = (
        "jax.config.update('jax_compilation_cache_dir', "
        "os.path.join(os.getcwd(), '.jax_cache_cpu')); "
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0); "
        if os.environ.get("WT_TEST_CACHE") == "1" else "")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import os; " + cache_cfg +
            f"from {module} import {func}; "
            f"{func}(); print({ok_token!r})")
    res = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=timeout)
    if res.returncode < 0 and cache_cfg:
        # signal death with the cache enabled: retry without it
        code = code.replace(cache_cfg, "")
        res = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                             capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (
        f"isolated {module}.{func} exited rc={res.returncode}\n"
        + res.stderr[-4000:])
    assert ok_token in res.stdout
