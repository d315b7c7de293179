#!/usr/bin/env python3
"""TPU benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}

Workloads (BENCH_WORKLOAD env var):

- ``fib`` (default): fibonacci f64 (Goldilocks) trace proved end-to-end with
  the device-resident GoldilocksProver, cubic extension, Rescue-Prime
  commitments (one of BASELINE.json's named configs). vs_baseline compares
  against the closest published reference number: the Rescue hash-chain
  96-bit prove time on an 8-core i9-9980KH matched by trace length
  (reference README.md table; no fibonacci timings are published).

- ``rescue_f128``: the reference's OWN headline benchmark, like for like —
  a Rescue hash chain over f128 with Blake3_256 commitments at the 96-bit
  parameters the published table uses (42 queries, blowup 4, grinding 16,
  no extension — examples/src/rescue/mod.rs:44 + examples/src/lib.rs:60-105),
  proved with the device F128Prover. BENCH_TRACE_LOG2 is the TRACE length
  exponent; chain length = trace/16 (16 rows per Rescue permutation).
  vs_baseline is the table's 96-bit prove time for that chain length.

Ratio < 1 means faster than the reference CPU baseline. Trace generation is
excluded, matching the reference's reporting split; one warmup proof absorbs
jit compilation (the reference's Rust is also pre-compiled).

Extra JSON fields (SURVEY §5.5 observability): per-phase seconds from
WINTER-span tracing plus derived lower-bound throughput rates —
``ntt_elems_per_s`` counts every column pass over its (i)NTT domain in the
commit+FRI phases, ``hashes_per_s`` counts Merkle leaf+merge hashes; both
divide by phase wall-clock that also covers the fused non-NTT work, so the
true kernel rates are higher.
"""

import json
import os
import sys
import time

# The axon sitecustomize registers the PJRT plugin at interpreter start and
# reads PALLAS_AXON_REMOTE_COMPILE *then* — setting it here is too late for
# this process. Local AOT compile fails against the pool's libtpu (see
# CLAUDE.md), so if we are on an axon pool without the flag, re-exec once
# with it set rather than letting every cache miss error out or hang.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and not os.environ.get("BENCH_PLATFORM")):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _phase_seconds(spans):
    return {rec["name"]: rec["seconds"] for rec in spans}


def _cache_entry_count():
    """Number of files in the persistent compile cache — a delta during the
    measured runs means a compile happened mid-measurement (contaminated)."""
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_cache")
    try:
        return sum(len(fs) for _, _, fs in os.walk(root))
    except OSError:
        return 0


def _measure(prover, trace, n_runs=3):
    """One prove WITH phase-boundary device barriers (per-phase attribution),
    then ``n_runs`` MEASURED proves free-running (barriers off — XLA
    pipelines adjacent phases' dispatches; each barrier costs a tunnel round
    trip). The reported value is the best wall clock over all measured
    proves (the barriered one included — it is a complete prove too): the
    round-4 driver bench showed host/tunnel contention can inflate a single
    free run ~2.4x (9.13 s vs 3.81 s rehearsal, VERDICT.md r4 weak #1), so a
    single sample is not trustworthy. All samples + a spread field are
    reported for diagnosis; a compile-cache file-count delta across the
    measured window flags mid-measurement compiles."""
    from winterfell_tpu.utils import tracing

    t0 = time.time()
    prover.prove(trace)
    sync_dt = time.time() - t0
    spans = tracing.last_spans()

    cache_before = _cache_entry_count()
    saved = tracing.phase_sync()
    if os.environ.get("WINTER_PHASE_SYNC") is None:
        tracing.set_phase_sync(False)
    runs = []
    try:
        for _ in range(n_runs):
            t0 = time.time()
            proof = prover.prove(trace)
            runs.append(time.time() - t0)
    finally:
        tracing.set_phase_sync(saved)
    compiled = _cache_entry_count() - cache_before

    dt = min(runs + [sync_dt])
    stats = {
        "runs": [round(r, 3) for r in runs],
        "sync_run": round(sync_dt, 3),
        "spread": round(max(runs) - min(runs), 3),
        "compiles_during_measure": compiled,
    }
    return proof, dt, spans, stats


def bench_fib(log2_len: int):
    from winterfell_tpu.air import FieldExtension, ProofOptions
    from winterfell_tpu.crypto.hashers import Rp64_256
    from winterfell_tpu.examples.fibonacci import (
        FibSmallAir,
        FibSmallProver,
        build_fib_trace,
    )
    from winterfell_tpu.math.fields import F64
    from winterfell_tpu.prover.device import GoldilocksProver
    from winterfell_tpu.verifier import verify

    n = 1 << log2_len  # trace length (rows); sequence length = 2n
    options = ProofOptions(
        num_queries=32, blowup_factor=8, grinding_factor=0,
        field_extension=FieldExtension.CUBIC,
        fri_folding_factor=8, fri_remainder_max_degree=31,
    )
    prover = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256)
    trace = build_fib_trace(F64, 2 * n)  # native C builder
    result = trace.get(1, n - 1)  # == compute_fib_term(F64, 2n), from trace

    prover.prove(trace)  # warmup (jit compile + twiddle caches)

    proof, dt, spans, stats = _measure(prover, trace)

    verify(FibSmallAir, proof, result, Rp64_256)

    # closest published reference figures: Rescue-chain 96-bit prove times on
    # the 8-core i9 (README.md table), matched by trace length
    baselines = {10: 0.04, 12: 0.14, 14: 0.6, 16: 2.5, 18: 11.0, 20: 50.0,
                 22: 220.0}  # 2^22 extrapolated at the table's ~4.5x/step
    lde = n * options.blowup_factor
    # columns through full-size (i)NTTs: trace interp+LDE (2 each), CE interp
    # + comp-column LDE (3 ext cols), DEEP, FRI folds (geometric < 4/3)
    ntt_cols = 2 * 2 + 2 * 3 + 3 + 2
    info = {
        "metric": f"fib_f64_2^{log2_len}_cubic_rp64_prover_wall_clock",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(dt / baselines.get(log2_len, 50.0), 4),
    }
    return info, spans, lde, ntt_cols, dt, stats


def bench_rescue_f128(log2_len: int):
    from winterfell_tpu.air import FieldExtension, ProofOptions
    from winterfell_tpu.crypto.hashers import Blake3_256
    from winterfell_tpu.examples.rescue import (
        RescueAir,
        RescueProver,
        build_rescue_trace,
    )
    from winterfell_tpu.prover.device_f128 import F128Prover
    from winterfell_tpu.verifier import verify

    chain = 1 << (log2_len - 4)  # 16 trace rows per Rescue permutation
    # the published table's 96-bit parameters (examples/src/rescue/mod.rs:44)
    options = ProofOptions(
        num_queries=42, blowup_factor=4, grinding_factor=16,
        field_extension=FieldExtension.NONE,
        fri_folding_factor=8, fri_remainder_max_degree=31,
    )
    prover = F128Prover.accelerate(RescueProver)(options, Blake3_256)
    seed = (42, 43)
    trace = build_rescue_trace(seed, chain)  # native C builder
    pub = prover.get_pub_inputs(trace)  # chain result = trace last row

    prover.prove(trace)  # warmup

    proof, dt, spans, stats = _measure(prover, trace)

    verify(RescueAir, proof, pub, Blake3_256)

    # reference README.md Rescue table, 96-bit prove column, by chain length
    baselines = {10: 0.04, 12: 0.14, 14: 0.6, 16: 2.5, 18: 11.0, 20: 50.0}
    lde = (1 << log2_len) * options.blowup_factor
    ntt_cols = 2 * 4 + 2 * 1 + 1 + 2  # width-4 trace, 1 comp col, DEEP, FRI
    info = {
        "metric": f"rescue_f128_chain_2^{log2_len - 4}_96bit_blake3_prover_wall_clock",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(dt / baselines.get(log2_len - 4, 50.0), 4),
    }
    return info, spans, lde, ntt_cols, dt, stats


def bench_lamport(n_sigs: int):
    """Reference headline table #2: Lamport+ aggregate signature proving
    (README.md Lamport rows; examples default options 28 queries, blowup 8,
    grinding 16, no extension, folding 8 — examples/src/lamport/aggregate/
    mod.rs:39 + lib.rs:96-105). Width-22 f128 AIR, 1024 trace rows/sig."""
    from winterfell_tpu.air import FieldExtension, ProofOptions
    from winterfell_tpu.crypto.hashers import Blake3_256
    from winterfell_tpu.examples.lamport import (
        LamportAggregateAir,
        LamportAggregateProver,
        LamportPublicInputs,
        PrivateKey,
        build_lamport_trace,
        message_to_elements,
    )
    from winterfell_tpu.prover.device_f128 import F128Prover
    from winterfell_tpu.verifier import verify

    options = ProofOptions(
        num_queries=28, blowup_factor=8, grinding_factor=16,
        field_extension=FieldExtension.NONE,
        fri_folding_factor=8, fri_remainder_max_degree=31,
    )
    keys = [PrivateKey(i) for i in range(n_sigs)]
    msgs = [message_to_elements(f"test message {i}".encode())
            for i in range(n_sigs)]
    sigs = [k.sign(f"test message {i}".encode())
            for i, k in enumerate(keys)]
    pks = [k.pub_key() for k in keys]
    prover = F128Prover.accelerate(LamportAggregateProver)(
        options, Blake3_256, pks, msgs)
    trace = build_lamport_trace(msgs, sigs)

    prover.prove(trace)  # warmup

    proof, dt, spans, stats = _measure(prover, trace)

    verify(LamportAggregateAir, proof,
           LamportPublicInputs(tuple(pks), tuple(msgs)), Blake3_256)

    # reference README.md Lamport table, proving-time column (8-core i9)
    baselines = {64: 1.2, 128: 2.6, 256: 5.3, 512: 10.9, 1024: 20.5}
    lde = 1024 * n_sigs * options.blowup_factor
    ntt_cols = 2 * 22 + 2 * 2 + 1 + 2
    info = {
        "metric": f"lamport_aggregate_{n_sigs}sigs_blake3_prover_wall_clock",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(dt / baselines.get(n_sigs, 20.5), 4),
    }
    return info, spans, lde, ntt_cols, dt, stats


def main() -> None:
    # Default 2^18: the 2^20 default timed out the round-2 AND round-3
    # driver benches (rc=124 — warm-cache executable LOADS alone push the
    # process wall past the driver timeout; see VERDICT.md r3 item 1).
    # 2^18 is the size whose whole process wall (hydrate + load + warmup +
    # prove + verify) fit the round-1 driver run with margin. The recorded
    # flagship 2^20/2^22 numbers live in README.md + .tpu_logs/.
    log2_len = int(os.environ.get("BENCH_TRACE_LOG2", "18"))
    workload = os.environ.get("BENCH_WORKLOAD", "fib")

    # first compile over the remote-compile tunnel is slow (30-120 s per
    # program); persist executables so repeated runs skip it entirely
    import jax

    # the ambient axon sitecustomize overrides JAX_PLATFORMS — forcing CPU
    # (e.g. for a smoke run while the TPU is busy) needs the config call
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from winterfell_tpu.utils import compile_cache

    compile_cache.enable(os.path.dirname(os.path.abspath(__file__)))

    if workload == "rescue_f128":
        info, spans, lde, ntt_cols, dt, stats = bench_rescue_f128(log2_len)
    elif workload == "lamport":
        n_sigs = int(os.environ.get("BENCH_SIGS", "256"))
        info, spans, lde, ntt_cols, dt, stats = bench_lamport(n_sigs)
    else:
        info, spans, lde, ntt_cols, dt, stats = bench_fib(log2_len)

    phases = _phase_seconds(spans)
    # ~2 hashes per LDE row across the trees (leaves + internal merges),
    # 3 committed matrices + folded FRI layers ≈ 4x
    commit_s = sum(v for k, v in phases.items()
                   if ("commit" in k and "upload" not in k)
                   or "resident" in k)
    # sanity floor: free-run span attribution can collapse the commit-phase
    # denominator to ~0 (r4 log showed 1.2e11 hashes/s); a commit phase under
    # 5% of the whole prove is not a credible denominator — use the prove
    # wall clock instead (rate becomes a lower bound, which is the contract)
    if not commit_s or commit_s < 0.05 * dt:
        commit_s = dt
    info["phases"] = {k: round(v, 3) for k, v in phases.items()}
    info["ntt_elems_per_s"] = round(ntt_cols * lde / dt)
    info["hashes_per_s"] = round(4 * 2 * lde / commit_s)
    info.update(stats)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
