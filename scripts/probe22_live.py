"""Run the 2^22 device prove with live-array accounting at each tree build."""
import os, sys, collections
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import winterfell_tpu.prover.device as dev

def dump(tag):
    arrs = jax.live_arrays()
    total = sum(a.nbytes for a in arrs) / 2**30
    by_shape = collections.Counter()
    for a in arrs:
        by_shape[(a.shape, str(a.dtype))] += a.nbytes
    print(f"=== {tag}: {len(arrs)} arrays, {total:.2f} GiB", flush=True)
    for (shape, dt), nb in sorted(by_shape.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {shape} {dt}: {nb/2**30:.3f} GiB", flush=True)

orig_init = dev._HeapNodesView.__init__
def patched(self, levels, num_leaves):
    dump(f"before tree view (leaves={num_leaves})")
    orig_init(self, levels, num_leaves)
    for lvl in levels.values():
        lvl.block_until_ready()
    dump("after tree view")
dev._HeapNodesView.__init__ = patched

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Rp64_256
from winterfell_tpu.examples.fibonacci import FibSmallProver, build_fib_trace
from winterfell_tpu.math.fields import F64
from winterfell_tpu.prover.device import GoldilocksProver

n = 1 << 22
options = ProofOptions(32, 8, 0, FieldExtension.CUBIC, 8, 31)
prover = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256)
trace = build_fib_trace(F64, 2 * n)
proof = prover.prove(trace)
print("PROVE OK", len(proof.to_bytes()), flush=True)
