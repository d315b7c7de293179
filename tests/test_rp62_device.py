"""Rp62_248 device kernel (ops/rp62_device.py) vs the host oracle, and the
F62Prover end-to-end with native Rp62_248 transcript/commitment hashing —
proof bytes must be IDENTICAL to the host prover's."""

import numpy as np
import pytest

import jax.numpy as jnp

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto import hashers as H
from winterfell_tpu.math.fields import F62
from winterfell_tpu.ops import f62
from winterfell_tpu.ops import rp62_device as rp62
from winterfell_tpu.prover.device_limb import F62Prover
from winterfell_tpu.verifier import verify

from tests.test_e2e_f62 import FibF62Air, FibF62Prover, _trace

P = F62.p


def _digest_bytes(dev_rows):
    arr = np.ascontiguousarray(np.asarray(dev_rows).astype("<u4"))
    return [arr[i].tobytes()[:31] for i in range(arr.shape[0])]


def _packed_words(digest: bytes):
    return np.frombuffer(digest + b"\x00", dtype="<u4").copy()


def test_rp62_permutation_matches_host():
    rng = np.random.default_rng(7)
    states = rng.integers(0, P, size=(5, 12)).astype(object)
    dev = f62.to_host(rp62.rp62_permutation_rows(f62.to_device(states)))
    for i in range(5):
        host = H.rp62_permutation([int(x) for x in states[i]])
        assert [int(x) for x in dev[i]] == host


@pytest.mark.parametrize("k", [2, 8, 11, 16])
def test_rp62_hash_words_matches_hash_elements(k):
    rng = np.random.default_rng(k)
    rows = rng.integers(0, P, size=(4, k)).astype(object)
    host = [H.Rp62_248.hash_elements([(int(v),) for v in row], None)
            for row in rows]
    words = f62.to_device(rows).astype(np.uint32).reshape(4, -1)
    dev = rp62.rp62_hash_words(words, 4 * words.shape[1], 8)
    assert _digest_bytes(dev) == host


def test_rp62_merge_and_merge_many_match_host():
    rng = np.random.default_rng(3)
    ds = [H.Rp62_248.hash(bytes(rng.integers(0, 256, size=40).tolist()))
          for _ in range(3)]
    left = jnp.asarray(np.stack([_packed_words(ds[0])]))
    right = jnp.asarray(np.stack([_packed_words(ds[1])]))
    assert _digest_bytes(rp62.rp62_merge_rows(left, right)) == [
        H.Rp62_248.merge(ds[0], ds[1])]

    digs = [jnp.asarray(np.stack([_packed_words(d)])) for d in ds]
    combined = rp62.rp62_combine(digs, 8, None)
    assert _digest_bytes(combined) == [H.Rp62_248.merge_many(ds)]


def test_rp62_merkle_levels_match_host_tree():
    from winterfell_tpu.crypto.merkle import MerkleTree

    rng = np.random.default_rng(11)
    leaves = [H.Rp62_248.hash(bytes(rng.integers(0, 256, size=16).tolist()))
              for _ in range(8)]
    host_tree = MerkleTree(leaves, H.Rp62_248)
    dev_leaves = jnp.asarray(np.stack([_packed_words(d) for d in leaves]))
    levels = {lvl.shape[0]: lvl for lvl in rp62.merkle_levels_rp62(dev_leaves)}
    for size, lvl in levels.items():
        got = _digest_bytes(lvl)
        want = [host_tree.nodes[size + i] for i in range(size)]
        assert got == want


# the full-prove byte-pins run in fresh interpreters (tests/isolation.py):
# the round-4 suite segfaulted in XLA:CPU compiling this file's limb
# programs in-process (_z_power_table under test_fib_f62_device_rp62)


def _rp62_device_check(ext_name: str):
    ext = getattr(FieldExtension, ext_name)
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host_prover = FibF62Prover(options, H.Rp62_248)
    host = host_prover.prove(_trace())
    dev = F62Prover.accelerate(FibF62Prover)(options, H.Rp62_248).prove(
        _trace())
    assert dev.to_bytes() == host.to_bytes()
    verify(FibF62Air, dev, host_prover.get_pub_inputs(_trace()), H.Rp62_248)


def _rp62_none():
    _rp62_device_check("NONE")


def _rp62_cubic():
    _rp62_device_check("CUBIC")


@pytest.mark.parametrize("fn", ["_rp62_none", "_rp62_cubic"])
def test_fib_f62_device_rp62_matches_host(fn):
    from tests.isolation import run_isolated

    run_isolated("tests.test_rp62_device", fn, "RP62_PIN_OK")


def _rp62_partitioned_check():
    from winterfell_tpu.air.options import PartitionOptions

    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7,
                           partition_options=PartitionOptions(2, 1))
    host_prover = FibF62Prover(options, H.Rp62_248)
    host = host_prover.prove(_trace())
    dev = F62Prover.accelerate(FibF62Prover)(options, H.Rp62_248).prove(
        _trace())
    assert dev.to_bytes() == host.to_bytes()
    verify(FibF62Air, dev, host_prover.get_pub_inputs(_trace()), H.Rp62_248)


def test_fib_f62_device_rp62_partitioned_matches_host():
    from tests.isolation import run_isolated

    run_isolated("tests.test_rp62_device", "_rp62_partitioned_check",
                 "RP62_PIN_OK")
