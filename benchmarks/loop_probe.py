#!/usr/bin/env python
"""Device-loop performance probe (real TPU): times the packed scanned
loop end-to-end at bench scale and attributes phases via GK_ABLATE.

Usage (fresh process per config — ablation flags are read at trace time):
  python benchmarks/loop_probe.py [--b 64] [--reps 3]
      [--gk smem|scalar|any] [--gt N] [--ablate graph|fuse|topo|remain]
      [--no-replay]

Prints one JSON line per rep: e2e wall, dp_seconds (device fetch wall),
dp_cells, cells/s, fallbacks. Tunnel-hang-safe: run under `timeout`.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--gk", default=None,
                    choices=["smem", "scalar", "any"])
    ap.add_argument("--gt", type=int, default=None)
    ap.add_argument("--ablate", default=None)
    ap.add_argument("--ab", default=None,
                    help="comma list of GK variants to A/B, e.g. 0,1,2")
    ap.add_argument("--abenv", default=None,
                    help="semicolon list of env-assignment variants to "
                         "A/B, e.g. 'ABPOA_LOOP_G=8;ABPOA_LOOP_G=16'")
    ap.add_argument("--no-replay", action="store_true")
    a = ap.parse_args()
    if a.gk:
        os.environ["ABPOA_GK_IMPL"] = a.gk
    if a.gt:
        os.environ["ABPOA_LOOP_GT"] = str(a.gt)
    if a.no_replay:
        os.environ["ABPOA_LOOP_NO_REPLAY"] = "1"
    if a.ablate:
        os.environ["ABPOA_GK_ABLATE"] = a.ablate

    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    tab = encode_table(5)
    recs = read_seqs(str(REPO / "tests" / "data" / "heter.fa"))
    reads = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
             for r in recs]
    instances = [reads] * a.b
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "b": a.b,
                      "gk": a.gk or "smem", "gt": a.gt,
                      "ablate": a.ablate}), flush=True)

    if a.ab or a.abenv:
        # interleaved A/B: one process, every variant compiled up
        # front, reps alternate so tunnel drift hits all variants
        # equally
        if a.abenv:
            variants = a.abenv.split(";")

            def setv(v):
                for kv in v.split(","):
                    k, _, val = kv.partition("=")
                    os.environ[k] = val
        else:
            variants = a.ab.split(",")

            def setv(v):
                os.environ["ABPOA_GK_VARIANT"] = v
        for v in variants:
            setv(v)
            t0 = time.perf_counter()
            bp = BatchPOA(Params().post_set())
            bp.run_consensus(instances)
            print(json.dumps({"variant": v, "warmup_s":
                              round(time.perf_counter() - t0, 3),
                              "device_loop": bp.used_device_loop}),
                  flush=True)
        times = {v: [] for v in variants}
        for rep in range(a.reps):
            for v in variants:
                setv(v)
                bp = BatchPOA(Params().post_set())
                t0 = time.perf_counter()
                bp.run_consensus(instances)
                times[v].append(time.perf_counter() - t0)
        for v in variants:
            ts = sorted(times[v])
            print(json.dumps({"variant": v,
                              "e2e_med": round(ts[len(ts) // 2], 4),
                              "e2e_all": [round(t, 4) for t in ts]}),
                  flush=True)
        return

    # warmup (compile)
    t0 = time.perf_counter()
    bp = BatchPOA(Params().post_set())
    bp.run_consensus(instances)
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 3),
                      "device_loop": bp.used_device_loop,
                      "fallbacks": bp.fallbacks}), flush=True)
    for rep in range(a.reps):
        bp = BatchPOA(Params().post_set())
        t0 = time.perf_counter()
        bp.run_consensus(instances)
        e2e = time.perf_counter() - t0
        print(json.dumps({
            "rep": rep, "e2e_s": round(e2e, 4),
            "dp_seconds": round(bp.dp_seconds, 4),
            "dp_cells": int(bp.dp_cells),
            "cells_per_s": round(bp.dp_cells / e2e, 1),
            "device_loop": bp.used_device_loop,
            "fallbacks": bp.fallbacks, "rounds": bp.rounds}),
            flush=True)


if __name__ == "__main__":
    main()
