#!/usr/bin/env python
"""Benchmark: aggregate POA DP throughput (band cells/s) on the TPU chip
vs the reference abPOA binary on the host CPU.

Prints ONE JSON line:
  {"metric": "dp_cells_per_s", "value": N, "unit": "cells/s",
   "vs_baseline": N / reference_cells_per_s, ...extras}

Band cells are identical between the engines (bit-identical band geometry,
see tests/test_engine_jax.py), so cells/s is a fair apples-to-apples rate.
The reference rate is measured live when .refbuild/bin_stock/abpoa exists
(tests/golden/make_sanitized_ref.sh builds it), else taken from the recorded
measurement in BENCH_BASELINE.json.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_INSTANCES = int(os.environ.get("ABPOA_BENCH_INSTANCES", "64"))
FIXTURE = os.environ.get("ABPOA_BENCH_FIXTURE", "heter.fa")
BASELINE_FILE = REPO / "BENCH_BASELINE.json"
REF_BIN = REPO / ".refbuild" / "bin_stock" / "abpoa"


def _load_reads(fn):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(REPO / "tests" / "data" / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs]


def _reference_cells_per_s(fixture: str, cells_per_instance: int) -> float:
    """Measure the reference binary's aggregate cells/s on this host."""
    if REF_BIN.exists():
        n = max(N_INSTANCES, 32)
        lst = "\n".join([str(REPO / "tests" / "data" / fixture)] * n) + "\n"
        lp = pathlib.Path("/tmp/abpoa_bench.list")
        lp.write_text(lst)
        # min of 3: external interference on the shared VM only ever
        # ADDS time, so the minimum is the best estimator of the
        # binary's true rate (same policy as the device side)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run([str(REF_BIN), "-l", str(lp)],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, check=True)
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        rate = n * cells_per_instance / dt
        # the committed baseline stays stable: a live measurement only
        # replaces it behind an explicit opt-in (a noisy run on a loaded
        # host must not silently rewrite the denominator)
        if os.environ.get("ABPOA_UPDATE_BASELINE") == "1":
            data = {}
            if BASELINE_FILE.exists():
                data = json.loads(BASELINE_FILE.read_text())
            data[fixture] = {"cells_per_s": rate, "n": n, "wall_s": dt}
            BASELINE_FILE.write_text(json.dumps(data, indent=1))
        return rate
    if BASELINE_FILE.exists():
        data = json.loads(BASELINE_FILE.read_text())
        if fixture in data:
            return float(data[fixture]["cells_per_s"])
    return float("nan")


def _seeded_instances(reads, n: int):
    """Config-5-shaped workload: n seeded amplicon windows with VARIED
    read lengths (deterministic trims -> several (R, Wq) shape buckets,
    stressing bucketing and recompilation, unlike identical copies)."""
    out = []
    for k in range(n):
        trim = (k % 5) * 120
        out.append([q[: max(64, len(q) - trim)] for q in reads])
    return out


def _bench_seeded(reads, n: int):
    """1k+ seeded windows through run_seeded (-S path; BASELINE.json
    config 5). Returns the JSON record."""
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    instances = _seeded_instances(reads, n)
    params = Params().post_set()
    params.disable_seeding = 0
    params.post_set()
    warm = BatchPOA(Params().post_set())
    warm.params.disable_seeding = 0
    warm.params.post_set()
    # device rounds chunk at 128 per shard group, so a 256-instance
    # warmup compiles every padded-batch bucket the timed run will see
    warm.run_seeded(_seeded_instances(reads, min(n, 256)))
    bp = BatchPOA(params)
    t0 = time.perf_counter()
    abs_ = bp.run_seeded(instances)
    e2e = time.perf_counter() - t0
    from abpoa_tpu.consensus import generate_consensus
    for ab in abs_[:4]:
        generate_consensus(ab, params)
        assert ab.cons.n_cons >= 1
    return {
        "metric": "seeded_windows_per_s",
        "value": round(n / e2e, 3),
        "unit": "windows/s",
        "extras": {
            "instances": n,
            "length_buckets": 5,
            "e2e_seconds": round(e2e, 3),
            "dp_seconds": round(bp.dp_seconds, 3),
            "dp_busy_seconds": round(bp.dp_busy_seconds(), 3),
            "dp_cells": bp.dp_cells,
            "rounds": bp.rounds,
            "fallbacks": bp.fallbacks,
        },
    }


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax.sharding import Mesh
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA

    reads = _load_reads(FIXTURE)
    instances = [reads] * N_INSTANCES
    params = Params().post_set()

    # warmup: compile every (shape-bucket) program at the bench batch size
    BatchPOA(Params().post_set()).run_consensus(instances)

    # min of 5 reps: the host VM and device tunnel are shared and the
    # interference is one-sided (it only ever adds time), so the minimum
    # estimates the system's true rate; the median is kept in extras.
    # The reference binary's rate uses the same min-of-N policy.
    reps = []
    for _ in range(5):
        bp = BatchPOA(Params().post_set())
        t0 = time.perf_counter()
        cons = bp.run_consensus(instances)
        reps.append((time.perf_counter() - t0, bp))
        assert all(c == cons[0] for c in cons)
    reps.sort(key=lambda x: x[0])
    e2e, bp = reps[0]
    e2e_median = reps[2][0]

    # mesh variant: the shard_map dispatch path (parallel/batch.py) on the
    # real chip (1-device mesh here; N-chip meshes use the same program)
    mesh_extras = None
    if os.environ.get("ABPOA_BENCH_MESH", "1") == "1":
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        BatchPOA(Params().post_set(), mesh=mesh).run_consensus(instances)
        bm = BatchPOA(Params().post_set(), mesh=mesh)
        t0 = time.perf_counter()
        cons_m = bm.run_consensus(instances)
        mesh_e2e = time.perf_counter() - t0
        assert cons_m == cons
        mesh_extras = {"devices": 1,
                       "e2e_seconds": round(mesh_e2e, 4),
                       "windows_per_s": round(N_INSTANCES / mesh_e2e, 4)}

    # config-5 seeded workload (second JSON line, printed first so the
    # driver's one-line contract keeps the headline metric last)
    seeded = None
    n_seeded = int(os.environ.get("ABPOA_BENCH_SEEDED", "1024"))
    if n_seeded:
        seeded = _bench_seeded(reads, n_seeded)
        print(json.dumps(seeded))

    cells_per_instance = bp.dp_cells // N_INSTANCES
    # aggregate end-to-end rate: same accounting as the reference side
    # (cells divided by total wall time including host graph work)
    value = bp.dp_cells / e2e
    ref_rate = _reference_cells_per_s(FIXTURE, cells_per_instance)
    out = {
        "metric": "dp_cells_per_s",
        "value": round(value, 1),
        "unit": "cells/s",
        "vs_baseline": round(value / ref_rate, 4) if ref_rate == ref_rate
        else None,
        "extras": {
            "fixture": FIXTURE,
            "instances": N_INSTANCES,
            "dp_cells": bp.dp_cells,
            "dp_seconds": round(bp.dp_seconds, 4),
            "dp_busy_seconds": round(bp.dp_busy_seconds(), 4),
            "e2e_seconds": round(e2e, 4),
            "e2e_seconds_median": round(e2e_median, 4),
            "windows_per_s": round(N_INSTANCES / e2e, 4),
            "ref_cells_per_s": round(ref_rate, 1) if ref_rate == ref_rate
            else None,
            "device": str(jax.devices()[0]),
            "mesh": mesh_extras,
            "seeded": (dict(value=seeded["value"], **seeded["extras"])
                       if seeded else None),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
