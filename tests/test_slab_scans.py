"""The scanned huge-domain slab paths (hash rows, DEEP combine) must produce
the same proof bytes as the fused/per-slab paths — exercised by shrinking
the slab constants so a 256-row trace routes through the scans."""

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256, Rp64_256
from winterfell_tpu.examples.fibonacci import FibSmallProver, build_fib_trace
from winterfell_tpu.examples.rescue import RescueProver, build_rescue_trace
from winterfell_tpu.math.fields import F64
from winterfell_tpu.prover import device as device_mod
from winterfell_tpu.prover import device_limb as limb_mod
from winterfell_tpu.prover.device import GoldilocksProver
from winterfell_tpu.prover.device_f128 import F128Prover


def test_f64_scan_slabs_match_fused(monkeypatch):
    options = ProofOptions(28, 8, 0, FieldExtension.CUBIC, 4, 7)
    prover = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256)
    fused = prover.prove(build_fib_trace(F64, 256))

    monkeypatch.setattr(device_mod, "_FUSE_LIMIT", 1)
    monkeypatch.setattr(device_mod, "_HASH_SLAB", 256)
    monkeypatch.setattr(device_mod, "_DEEP_SLAB", 256)
    scanned = GoldilocksProver.accelerate(FibSmallProver)(
        options, Rp64_256).prove(build_fib_trace(F64, 256))
    assert scanned.to_bytes() == fused.to_bytes()


def test_f128_scan_slabs_match_fused(monkeypatch):
    options = ProofOptions(28, 4, 0, FieldExtension.NONE, 4, 7)
    prover = F128Prover.accelerate(RescueProver)(options, Blake3_256)
    fused = prover.prove(build_rescue_trace((1, 2), 16))  # 256-row trace

    monkeypatch.setattr(limb_mod, "_FUSE_LIMIT", 1)
    monkeypatch.setattr(limb_mod, "_HASH_SLAB", 256)
    monkeypatch.setattr(limb_mod, "_DEEP_SLAB_LIMB", 256)
    scanned = F128Prover.accelerate(RescueProver)(
        options, Blake3_256).prove(build_rescue_trace((1, 2), 16))
    assert scanned.to_bytes() == fused.to_bytes()
