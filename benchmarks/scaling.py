#!/usr/bin/env python
"""Scaling harness: consensus windows/s at 1 chip -> N devices -> M hosts.

Targets the BASELINE.md north-star metric "consensus-windows/s scaling
efficiency from 1 host to 2 hosts". Instances are independent, so the DP
shards data-parallel over a jax.sharding.Mesh with no collectives
(parallel/batch.py); scaling is bounded by the host-side graph work per
process, which shards with jax.distributed across hosts.

Modes:
  python benchmarks/scaling.py             # devices on this process
  python benchmarks/scaling.py --cpu N     # N virtual CPU devices (no TPU)

On a multi-host pod slice, launch one process per host with
jax.distributed.initialize() (standard JAX recipe); each host runs its own
BatchPOA over its shard of the instance list and writes consensus FASTA for
its shard; host 0 concatenates. Windows/s scales with hosts because
instances never communicate.

Prints one JSON line per device count.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of the TPU")
    ap.add_argument("--instances", type=int, default=32)
    ap.add_argument("--fixture", default="heter.fa")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_"
                                     f"count={args.cpu}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from jax.sharding import Mesh
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table

    tab = encode_table(5)
    recs = read_seqs(str(REPO / "tests" / "data" / args.fixture))
    reads = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
             for r in recs]
    instances = [reads] * args.instances

    devs = jax.devices()
    counts = sorted({1, max(1, len(devs) // 2), len(devs)})
    base_rate = None
    for nd in counts:
        mesh = Mesh(np.array(devs[:nd]), ("data",)) if nd > 1 else None
        # warm compile, then time
        BatchPOA(Params().post_set(), mesh=mesh).run_consensus(instances)
        bp = BatchPOA(Params().post_set(), mesh=mesh)
        t0 = time.perf_counter()
        bp.run_consensus(instances)
        dt = time.perf_counter() - t0
        rate = args.instances / dt
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "devices": nd, "windows_per_s": round(rate, 3),
            "efficiency_vs_1dev": round(rate / (base_rate * nd), 3),
            "wall_s": round(dt, 3), "cells": bp.dp_cells,
        }))


if __name__ == "__main__":
    main()
