"""Persistent-compile-cache helpers.

XLA programs for this framework compile over a remote tunnel (30-180 s per
program — see CLAUDE.md); the persistent compilation cache makes warm runs
skip all of it. Because the runtime cache directory (``.jax_cache``) is
wiped between driver rounds, a SEED copy of the executables needed by the
default benchmark configuration is checked into git at ``.jax_cache_seed``
and hydrated (hardlinked) into the runtime directory before proving.

This mirrors what the reference gets for free from ahead-of-time Rust
compilation: its benchmark binaries ship compiled; ours ship as cached XLA
executables.
"""

from __future__ import annotations

import os

SEED_DIR_NAME = ".jax_cache_seed"
CACHE_DIR_NAME = ".jax_cache"

_MOSAIC_PATCHED = False


def stabilize_pallas_cache_keys() -> None:
    """Make Pallas programs' persistent-cache keys survive source edits.

    JAX strips debug info from the OUTER module before hashing it into the
    compilation-cache key, but a Mosaic kernel is serialized into the
    ``tpu_custom_call`` backend_config at lowering time WITH its Python
    stack locations (file:line of every caller frame). Any edit that
    shifts a line in any file on the kernel's call stack therefore changes
    the payload bytes → different cache key → every Pallas-containing
    program recompiles (~1-5 min each over the remote tunnel). That is
    what timed out the round-2 driver bench.

    Fix: wrap ``_lower_mosaic_module_to_asm`` to re-parse the serialized
    kernel and run ``strip-debuginfo`` on it, so the payload depends only
    on the kernel's computation. Verified identical across call-site line
    shifts and ~25% smaller; semantics are unchanged (locations are
    metadata)."""
    global _MOSAIC_PATCHED
    if _MOSAIC_PATCHED:
        return
    _MOSAIC_PATCHED = True
    try:
        import io

        from jax._src import tpu_custom_call as tcc
        from jax._src.lib.mlir import ir
        from jax._src.tpu_custom_call import PassManager
    except Exception:  # pragma: no cover - very old jax
        return

    orig = tcc._lower_mosaic_module_to_asm

    def wrapped(module, *, ir_version=None):
        asm, flags = orig(module, ir_version=ir_version)
        try:
            with module.context as ctx:
                prev = ctx.allow_unregistered_dialects
                ctx.allow_unregistered_dialects = True
                try:
                    m2 = ir.Module.parse(asm)
                    PassManager.parse(
                        "builtin.module(strip-debuginfo)").run(m2.operation)
                    buf = io.BytesIO()
                    m2.operation.write_bytecode(buf, desired_version=0)
                    asm = buf.getvalue()
                finally:
                    ctx.allow_unregistered_dialects = prev
        except Exception:
            pass  # keep the unscrubbed payload rather than fail lowering
        return asm, flags

    tcc._lower_mosaic_module_to_asm = wrapped


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def hydrate(root: str | None = None) -> int:
    """Hardlink (or copy) every seed executable missing from the runtime
    cache dir. Returns the number of entries hydrated. Safe no-op when the
    seed directory does not exist."""
    root = root or repo_root()
    seed = os.path.join(root, SEED_DIR_NAME)
    cache = os.path.join(root, CACHE_DIR_NAME)
    if not os.path.isdir(seed):
        return 0
    os.makedirs(cache, exist_ok=True)
    n = 0
    for name in os.listdir(seed):
        src = os.path.join(seed, name)
        dst = os.path.join(cache, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            os.link(src, dst)
        except OSError:
            import shutil

            shutil.copyfile(src, dst)
        n += 1
    return n


def enable(root: str | None = None, hydrate_seed: bool = True) -> None:
    """Point JAX's persistent compilation cache at <root>/.jax_cache and
    hydrate it from the committed seed."""
    import jax

    root = root or repo_root()
    if hydrate_seed:
        hydrate(root)
    stabilize_pallas_cache_keys()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, CACHE_DIR_NAME))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
