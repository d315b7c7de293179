#!/usr/bin/env python3
"""Profile a warm rescue_f128 prove (the reference's headline workload) with
jax.profiler and print the per-kernel device-time breakdown plus the phase
spans. env: PROF_CHAIN_LOG2 (default 14), PROF_DIR (default /tmp/jaxprof_r)
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from winterfell_tpu.utils import compile_cache

compile_cache.enable()

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.rescue import RescueProver, build_rescue_trace
from winterfell_tpu.prover.device_f128 import F128Prover
from winterfell_tpu.utils import tracing

CHAIN_LOG2 = int(os.environ.get("PROF_CHAIN_LOG2", "14"))
PROF_DIR = os.environ.get("PROF_DIR", "/tmp/jaxprof_r")


def main():
    chain = 1 << CHAIN_LOG2
    options = ProofOptions(
        num_queries=42, blowup_factor=4, grinding_factor=16,
        field_extension=FieldExtension.NONE,
        fri_folding_factor=8, fri_remainder_max_degree=31,
    )
    prover = F128Prover.accelerate(RescueProver)(options, Blake3_256)
    t0 = time.time()
    trace = build_rescue_trace((42, 43), chain)
    print(f"trace gen (native C): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    prover.prove(trace)
    print(f"warmup prove: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    prover.prove(trace)
    print(f"warm prove: {time.time() - t0:.2f}s", flush=True)
    for rec in tracing.last_spans():
        print(f"  {rec['name']}: {rec['seconds']*1e3:.0f} ms", flush=True)

    with jax.profiler.trace(PROF_DIR):
        t0 = time.time()
        prover.prove(trace)
        dt = time.time() - t0
    print(f"profiled prove: {dt:.2f}s", flush=True)

    paths = sorted(glob.glob(os.path.join(
        PROF_DIR, "plugins/profile/*/*trace.json.gz")), key=os.path.getmtime)
    if not paths:
        print("no trace found under", PROF_DIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace_doc = json.load(f)
    events = trace_doc.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        key = e["name"].split(".")[0][:60]
        by_name[key] += e["dur"] / 1e6
        total[pname] += e["dur"] / 1e6
    print("\n-- device totals by process --")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"{v:9.3f}s  {k}")
    print("\n-- top kernels by device time --")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:9.3f}s  {k}")


if __name__ == "__main__":
    main()
