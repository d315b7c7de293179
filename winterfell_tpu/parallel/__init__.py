"""Multi-chip parallelism: device meshes, sharded commitments, and the
distributed six-step NTT.

The reference's only parallelism is shared-memory rayon (SURVEY §1); its
`PartitionOptions` column-partitioned hashing (air/src/options.rs:404-445) is
the lone multi-device hook. Here the scaling story is TPU-native:

- a 1-D ``jax.sharding.Mesh`` over chips (ICI); multi-host pods extend the
  same mesh across hosts (DCN only carries the tiny host-side transcript),
- **column/trace parallelism**: per-column NTTs and constraint columns are
  embarrassingly parallel → shard the column axis,
- **row parallelism**: row hashing and FRI folding shard the row axis,
- the **six-step NTT** (the transpose-decomposed radix split mirrored from
  the reference's concurrent FFT, math/src/fft/concurrent.rs:132-171) turns a
  row-sharded length-n NTT into two batches of local NTTs separated by one
  all-to-all transpose over ICI — the standard distributed-FFT recipe.

Everything is exact integer arithmetic, so sharding cannot change a single
proof byte; tests pin sharded results to the single-device oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..math.fields import F64
from ..ops import goldilocks as gl

__all__ = ["make_mesh", "make_mesh_2d", "ntt_six_step", "ntt_six_step_2d",
           "sharded_lde", "sharded_commit"]


from functools import lru_cache


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=(axis,))


@partial(jax.jit, static_argnums=(4, 5))
def _six_step_core(x, mid_tw, inner_plan, outer_plan, n: int, a: int):
    """Six-step NTT of length n = a·b over the leading axis (derivation in
    module docstring; matches gl.ntt_evaluate exactly):

    1. view x as (b, a): M[j2, j1] = x[j1 + a·j2]
    2. b-point NTTs down the columns (leading axis)      [local if sharded on j1]
    3. twiddle scale by w_n^(j1·k2)                      [mid_tw: device-built arg]
    4. transpose to (a, b)                               [the all-to-all]
    5. a-point NTTs down the columns                     [local if sharded on k2]
    6. flatten (a, b) → natural-order result
    """
    b = n // a
    rest = x.shape[1:]
    m = x.reshape((b, a) + rest)
    y = gl._ntt_core(m, b, inverse=False, plan=inner_plan)  # (b, a, ...)
    y = gl.gl_mul(y, mid_tw.reshape((b, a) + (1,) * len(rest)))

    z = jnp.swapaxes(y, 0, 1)  # (a, b, ...) — the transpose / all-to-all
    out = gl._ntt_core(z, a, inverse=False, plan=outer_plan)  # (a, b, ...)
    return out.reshape((n,) + rest)


def ntt_six_step(x, n: int, a: Optional[int] = None):
    """Distributed-friendly NTT: natural order in/out, identical values to
    ``gl.ntt_evaluate``. `a` is the outer factor (defaults to a balanced
    split)."""
    if a is None:
        log_n = n.bit_length() - 1
        a = 1 << (log_n // 2)
    b = n // a
    return _six_step_core(x, gl._mid_twiddles_dev(n, a, False),
                          gl.ntt_plan(b, False), gl.ntt_plan(a, False), n, a)


def make_mesh_2d(n_hosts: int, chips_per_host: int,
                 axes=("host", "chip")) -> Mesh:
    """(hosts × chips) mesh: the outer axis models the DCN boundary, the
    inner axis ICI. On real pods jax.devices() orders devices host-major, so
    this reshape puts each host's chips on one row; on the CPU test backend
    the virtual devices stand in for both."""
    devices = np.array(jax.devices()[: n_hosts * chips_per_host])
    return Mesh(devices.reshape(n_hosts, chips_per_host), axis_names=axes)


@lru_cache(maxsize=None)
def _six_step_2d_fn(mesh: Mesh, n: int, a: int, axes):
    """Jitted six-step NTT with explicit 2-D shardings (cached per mesh/size).

    The (b, a) matrix is sharded on the COLUMN axis over the full
    (host × chip) mesh for the inner length-b NTTs (each device owns whole
    columns — fully local), and re-sharded on its new column axis after the
    transpose — the transpose is thus ONE all-to-all whose host-axis
    component is the only DCN traffic of the entire transform. This is the
    standard distributed-FFT factorization (SURVEY §5.8; the multi-host
    scaling recipe in SCALING.md builds on it)."""
    b = n // a
    col_spec = NamedSharding(mesh, P(None, axes))

    @jax.jit
    def run(x, mid_tw):
        rest = x.shape[1:]
        m = jax.lax.with_sharding_constraint(
            x.reshape((b, a) + rest),
            NamedSharding(mesh, P(None, axes, *(None,) * len(rest))))
        y = gl._ntt_core(m, b, inverse=False, plan=gl.ntt_plan(b, False))
        y = gl.gl_mul(y, mid_tw.reshape((b, a) + (1,) * len(rest)))
        z = jnp.swapaxes(y, 0, 1)  # (a, b, ...) — the all-to-all
        z = jax.lax.with_sharding_constraint(
            z, NamedSharding(mesh, P(None, axes, *(None,) * len(rest))))
        out = gl._ntt_core(z, a, inverse=False, plan=gl.ntt_plan(a, False))
        return out.reshape((n,) + rest)

    return run


def ntt_six_step_2d(mesh: Mesh, x, n: int, a: Optional[int] = None):
    """Distributed NTT over a 2-D (host × chip) mesh: natural order in/out,
    values identical to ``gl.ntt_evaluate`` (pinned in tests)."""
    if a is None:
        a = 1 << ((n.bit_length() - 1) // 2)
    fn = _six_step_2d_fn(mesh, n, a, tuple(mesh.axis_names))
    return fn(x, gl._mid_twiddles_dev(n, a, False))


def sharded_lde(mesh: Mesh, trace, n: int, offset: int, blowup: int,
                axis: str = "x"):
    """Coset LDE with trace columns sharded over the mesh: each device runs
    the NTTs for its columns; XLA keeps everything local (no collectives on
    this path — column parallelism)."""
    col_sharding = NamedSharding(mesh, P(None, axis))
    trace = jax.device_put(trace, col_sharding)

    @partial(jax.jit, static_argnums=(4, 5))
    def run(trace, inv_plan, off_pows, fwd_plan, n, blowup):
        out = jax.lax.with_sharding_constraint(trace, col_sharding)
        polys = gl.ntt_interpolate_body(out, inv_plan, n)
        lde = gl.ntt_lde_body(polys, off_pows, fwd_plan, n, blowup)
        return jax.lax.with_sharding_constraint(lde, col_sharding)

    return run(trace, gl.ntt_plan(n, True), gl._power_series_dev(offset, n),
               gl.ntt_plan(n * blowup, False), n, blowup)


def sharded_commit(mesh: Mesh, lde, axis: str = "x"):
    """Row-hash + Merkle-reduce a column-sharded LDE: XLA all-gathers the
    columns per row block (the PartitionOptions-style reshuffle), then the
    hash and the log-depth Merkle reduction run row-sharded."""
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=replicated)
    def run(lde):
        leaves = gl.rp64_hash_rows(lde)
        levels = gl._merkle_levels_impl(leaves)
        return levels[-1]  # the root digest (1, 4)

    return run(lde)
