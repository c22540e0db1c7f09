#!/usr/bin/env python
"""Benchmark: aggregate POA DP throughput (band cells/s) on the TPU chip
vs the reference abPOA binary on the host CPU.

Prints JSON lines; every line is a full headline record
  {"metric": "dp_cells_per_s", "value": N, "unit": "cells/s",
   "vs_baseline": N / reference_cells_per_s, ...extras}
re-emitted as each phase lands, so the LAST line is always the most
complete measurement available — even if the process is killed mid-run.

Hard wall-clock budget (ABPOA_BENCH_BUDGET_S, default 360 s): a watchdog
thread emits the best record so far and exits 0 at the deadline, so a
degraded device tunnel can slow the bench down but can never turn it into
an rc=124 with no output (the round-2 failure mode). Each optional phase
(extra reps, kernel-rate, mesh, seeded) runs only if enough budget
remains and skips cleanly otherwise.

Band cells are identical between the engines (bit-identical band geometry,
see tests/test_engine_jax.py), so cells/s is a fair apples-to-apples rate.
The reference rate is measured live when .refbuild/bin_stock/abpoa exists
(tests/golden/make_sanitized_ref.sh builds it), else taken from the recorded
measurement in BENCH_BASELINE.json. Telemetry analog in the reference:
wall/CPU/RSS footer, /root/reference/src/abpoa.c:146.

Extras:
  kernel_cells_per_s — chained-dispatch kernel-only rate: the largest
    captured round is replayed K times back-to-back with ONE readback, so
    the per-call tunnel RTT (~30-60 ms here) amortizes away and the number
    reflects on-chip sweep+walk time (docs/ROADMAP.md round-2 analysis).
  mesh   — same pipeline through the shard_map dispatch on a 1-device mesh.
  seeded — config-5 seeded/windowed workload (BASELINE.json), windows/s.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_INSTANCES = int(os.environ.get("ABPOA_BENCH_INSTANCES", "64"))
FIXTURE = os.environ.get("ABPOA_BENCH_FIXTURE", "heter.fa")
BUDGET_S = float(os.environ.get("ABPOA_BENCH_BUDGET_S", "500"))
BASELINE_FILE = REPO / "BENCH_BASELINE.json"
REF_BIN = REPO / ".refbuild" / "bin_stock" / "abpoa"

T_START = time.monotonic()
DEADLINE = T_START + BUDGET_S


def left() -> float:
    return DEADLINE - time.monotonic()


# ------------------------------------------------------------------ #
# headline record: re-emitted after every phase; the watchdog re-prints
# the latest one at the deadline so the last stdout line always parses
_STATE: dict = {"record": None, "done": False}
# single-writer discipline for stdout: the watchdog can fire while the
# main thread is mid-print, and an interleaved write would corrupt the
# "last line always parses" contract exactly in the degraded-tunnel case
_EMIT_LOCK = threading.Lock()


def emit(record: dict) -> None:
    _STATE["record"] = record
    with _EMIT_LOCK:
        print(json.dumps(record), flush=True)


def _watchdog() -> None:
    while not _STATE["done"]:
        if time.monotonic() >= DEADLINE:
            rec = _STATE["record"] or {
                "metric": "dp_cells_per_s", "value": 0.0,
                "unit": "cells/s", "vs_baseline": None,
                "extras": {"error": "budget exhausted before any "
                                    "measurement completed"}}
            rec = dict(rec)
            rec.setdefault("extras", {})
            rec["extras"] = dict(rec["extras"], budget_exhausted=True)
            # bounded acquire: exit must not hinge on a wedged main
            # thread (a dead device call never holds the lock, but a
            # blocked stdout write could)
            got = _EMIT_LOCK.acquire(timeout=10.0)
            try:
                print("\n" + json.dumps(rec), flush=True)
            finally:
                if got:
                    _EMIT_LOCK.release()
            os._exit(0)
        time.sleep(1.0)


def _load_reads(fn):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(REPO / "tests" / "data" / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs]


def _reference_wall(fixture: str):
    """Measure the reference binary's wall time on this host CPU.
    Returns (n_instances, min_wall_s) or None. Runs before any device
    work — it needs no JAX and finishes in seconds."""
    if not REF_BIN.exists():
        return None
    n = max(N_INSTANCES, 32)
    lst = "\n".join([str(REPO / "tests" / "data" / fixture)] * n) + "\n"
    lp = pathlib.Path("/tmp/abpoa_bench.list")
    lp.write_text(lst)
    # min of 3: external interference on the shared VM only ever ADDS
    # time, so the minimum is the best estimator of the binary's rate
    # (same policy as the device side)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        subprocess.run([str(REF_BIN), "-l", str(lp)],
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL, check=True)
        dts.append(time.perf_counter() - t0)
    return n, min(dts)


def _reference_cells_per_s(ref_wall, fixture, cells_per_instance,
                           update=False):
    stored = None
    if BASELINE_FILE.exists():
        data = json.loads(BASELINE_FILE.read_text())
        if fixture in data:
            stored = float(data[fixture]["cells_per_s"])
    if ref_wall is not None:
        n, dt = ref_wall
        rate = n * cells_per_instance / dt
        # denominator = the REFERENCE'S BEST known rate: a loaded host
        # slows the live measurement and would flatter vs_baseline;
        # taking max(live, stored) is conservative for our own number
        if stored is not None:
            rate = max(rate, stored)
        # the committed baseline stays stable: a live measurement only
        # replaces it behind an explicit opt-in (a noisy run on a loaded
        # host must not silently rewrite the denominator), and only once
        # per run — after the reps loop settles on the best cpi
        if update and os.environ.get("ABPOA_UPDATE_BASELINE") == "1":
            data = {}
            if BASELINE_FILE.exists():
                data = json.loads(BASELINE_FILE.read_text())
            data[fixture] = {"cells_per_s": rate, "n": n, "wall_s": dt}
            BASELINE_FILE.write_text(json.dumps(data, indent=1))
        return rate
    if stored is not None:
        return stored
    return float("nan")


def _headline(bp, e2e, ref_rate, extras_extra=None, e2e_med=None):
    """Headline record. The OFFICIAL value/vs_baseline are computed off
    the MEDIAN rep (round-3 verdict: min-of-N flattered by 2.3x on the
    noisy tunnel); the best rep is reported alongside in extras."""
    if e2e_med is None:
        e2e_med = e2e
    value = bp.dp_cells / e2e_med
    best_value = bp.dp_cells / e2e
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
            "e2e_seconds_median": round(e2e_med, 4),
            "e2e_seconds_best": round(e2e, 4),
            "headline_rep": "median",
            "best_cells_per_s": round(best_value, 1),
            "best_vs_baseline": round(best_value / ref_rate, 4)
            if ref_rate == ref_rate else None,
            "windows_per_s": round(N_INSTANCES / e2e_med, 4),
            "ref_cells_per_s": round(ref_rate, 1) if ref_rate == ref_rate
            else None,
            "budget_s": BUDGET_S,
            "elapsed_s": round(time.monotonic() - T_START, 1),
        },
    }
    if extras_extra:
        out["extras"].update(extras_extra)
    return out


# ------------------------------------------------------------------ #
# Roofline model for the banded DP (BASELINE.md "DP-cells/s/chip vs
# roofline"). Ops/cell counts the int ALU work of the convex-gap
# recurrence as the kernel computes it (dp_pallas_band row body): per
# cell it forms M = H[pre]+qp, E1/E2 extend-vs-open maxes, F1/F2 via the
# in-row prefix scan, the 5-way H max, backtrack-bit packing and the
# band/rowmax bookkeeping — ~30 int ops. The VPU peak is 8x128 lanes x
# 2 issue x ~1.74 GHz ~= 3.56e12 int32 ops/s on a v5e core (int16
# doubles the lanes). The kernel is compute-bound: all planes are
# VMEM-resident, HBM traffic per round is only the control/steps
# streams, so the ridge point is far to the left of the working set.
OPS_PER_CELL = 30
VPU_PEAK_INT32 = 8 * 128 * 2 * 1.74e9


def _roofline(cells_per_s: float) -> dict:
    return {"ops_per_cell": OPS_PER_CELL,
            "vpu_peak_int_ops": VPU_PEAK_INT32,
            "roofline_pct": round(
                100.0 * cells_per_s * OPS_PER_CELL / VPU_PEAK_INT32, 4)}


def _synth_round(reads):
    """Build one representative nb=16 kernel round without the batch
    pipeline: fuse all-but-one read on the host oracle (C-backed, fast),
    export the mature graph, and stack 16 copies of the final
    alignment. Used when the device-resident loop handled e2e (it emits
    no per-round captures)."""
    import jax.numpy as jnp
    from abpoa_tpu.api import ABPOA
    from abpoa_tpu.params import Params
    from abpoa_tpu.align.engine_jax import (export_dense,
                                            make_pallas_inputs, pick_WB)
    from abpoa_tpu.ops.dp_pallas_band import (BandConfig,
                                              band_poa_dp_batch,
                                              pick_band_G)
    params = Params().post_set()
    ab = ABPOA()
    for r, q in enumerate(reads[:-1]):
        ab.poa_one(params, q, [1] * len(q), r)
    ab.graph.topological_sort(params)
    q = reads[-1]
    dg = export_dense(ab.graph, params, q)
    WB = pick_WB(params, dg.qlen, dg.pn)
    Wq = (dg.qlen // 128 + 1) * 128
    LMAX = (dg.R + Wq + 63) // 64 * 64
    WqB = (Wq + WB - 1) // WB * WB
    cfg, arrs = make_pallas_inputs(dg, params, WB, force_Wq=WqB,
                                   bt_lmax=LMAX)
    G = pick_band_G(cfg.gap_mode, dg.R, WB, cfg.P, cfg.m, LMAX)
    if G < 1:
        return None
    B = max(G, 16)
    bc = BandConfig(gap_mode=cfg.gap_mode, align_mode=cfg.align_mode,
                    pn=cfg.pn, R=dg.R, WB=WB, Wq=WqB, P=cfg.P, O=cfg.O,
                    m=cfg.m, use_zdrop=cfg.use_zdrop, bt_lmax=LMAX,
                    G=min(G, B), fresh=True)
    dummy = {4, 5, 8, 9, 10}
    stacked = tuple(
        jnp.asarray(np.zeros((B, 1), np.int8)) if i in dummy
        else jnp.asarray(np.stack([a] * B))
        for i, a in enumerate(arrs))
    kern = lambda *a: band_poa_dp_batch(bc, *a)  # noqa: E731
    return kern, stacked, B


def _bench_kernel_rate(captured, reads=None):
    """On-chip kernel-only rate via a DEVICE-SIDE chained replay: K
    invocations of the largest captured round run inside one jitted
    lax.scan (an optimization_barrier threads the inputs through the
    carry so XLA cannot hoist the loop-invariant call), so the whole
    chain is ONE dispatch + ONE readback and the per-call tunnel RTT
    (~25 ms here) amortizes to nothing. The old host-side loop paid the
    RTT per call and measured the tunnel, not the chip (round-3 verdict:
    66 ms/round vs the true ~5-8 ms). The tunnel's block_until_ready
    does not actually block (CLAUDE.md), so completion is forced through
    a device->host readback of the accumulated scalar."""
    import jax
    import jax.numpy as jnp
    from abpoa_tpu.ops import dp_pallas as dpp
    if captured:
        # largest round = most cells; proxy: batch size x input bytes
        kern_fn, stacked, nb = max(
            captured, key=lambda c: c[2] * sum(int(np.prod(a.shape))
                                               for a in c[1]))
    elif reads:
        synth = _synth_round(reads)
        if synth is None:
            return None
        kern_fn, stacked, nb = synth
    else:
        return None
    out = kern_fn(*stacked)
    misc = jax.device_get(out.misc)          # readback = real barrier
    cells = int(misc[:nb, dpp.M_CELLS].sum())
    K = int(os.environ.get("ABPOA_BENCH_KERNEL_K", "32"))

    @jax.jit
    def chain(args):
        def body(carry, _):
            acc, a = carry
            a = jax.lax.optimization_barrier(a)
            o = kern_fn(*a)
            # fold a result scalar into the carry so no iteration is dead
            acc = acc + o.misc[0, dpp.M_CELLS]
            return (acc, a), None
        (acc, _), _ = jax.lax.scan(body, (jnp.int32(0), args), length=K)
        return acc

    jax.device_get(chain(stacked))           # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain(stacked))
        reps.append(time.perf_counter() - t0)
    dt = min(reps)
    rate = K * cells / dt
    rec = {"kernel_cells_per_s": round(rate, 1),
           "kernel_chain_K": K,
           "kernel_chain": "device-side lax.scan, 1 dispatch",
           "kernel_round_ms": round(dt / K * 1e3, 3),
           "kernel_round_cells": cells,
           "kernel_batch": nb}
    rec.update(_roofline(rate))
    return rec


def _bench_transport(captured):
    """Tunnel transport breakdown: RTT, uplink/downlink bandwidth, and
    the bytes one POA round actually ships. Together with
    kernel_cells_per_s this decomposes e2e into kernel + transport and
    yields a projected rate for a directly-attached chip (no tunnel) —
    the evidence that the residual vs_baseline gap is the transport
    floor, not the kernel (docs/ROADMAP.md)."""
    import jax
    import jax.numpy as jnp
    # RTT: round-trip a 4-byte scalar (min of 5: interference only adds)
    one = np.zeros(1, np.int32)
    jax.device_get(jax.device_put(one))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(one))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    # bandwidth: 8 MB payloads (large enough to amortize the RTT)
    big = np.zeros(8 << 20, np.uint8)
    ups, downs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(big)
        jax.device_get(dev[:1])          # force completion
        ups.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(dev)
        downs.append(time.perf_counter() - t0)
    up_bw = big.nbytes / min(ups)
    down_bw = big.nbytes / min(downs)
    rec = {"tunnel_rtt_ms": round(rtt * 1e3, 2),
           "uplink_mbps": round(up_bw / 1e6, 1),
           "downlink_mbps": round(down_bw / 1e6, 1)}
    if captured:
        up_bytes = [sum(int(a.size * a.dtype.itemsize) for a in c[1])
                    for c in captured]
        rec["rounds_captured"] = len(captured)
        rec["bytes_up_per_round"] = int(np.mean(up_bytes))
        rec["bytes_up_total"] = int(np.sum(up_bytes))
        # per-round transport floor: upload + RTT (downlink is the
        # capped steps16/misc fetch, small next to the upload)
        rec["transport_floor_ms_per_round"] = round(
            (np.mean(up_bytes) / up_bw + rtt) * 1e3, 2)
    return rec


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
    """Seeded windows through run_seeded (-S path; BASELINE.json config
    5). Returns the JSON record dict for the headline extras."""
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    params = Params().post_set()
    params.disable_seeding = 0
    params.post_set()
    if left() < 100:
        # the warm-up alone can eat the residual budget on a degraded
        # tunnel — skip the whole phase rather than warm-then-bail
        return {"skipped": "budget"}
    warm = BatchPOA(Params().post_set())
    warm.params.disable_seeding = 0
    warm.params.post_set()
    # device rounds chunk at 128 per shard group, so a 128-instance
    # warmup compiles the padded-batch buckets the timed run will see
    warm.run_seeded(_seeded_instances(reads, min(n, 128)))
    if left() < 45:
        return {"skipped": "budget", "warmed": True}
    bp = BatchPOA(params)
    t0 = time.perf_counter()
    abs_ = bp.run_seeded(_seeded_instances(reads, n))
    e2e = time.perf_counter() - t0
    from abpoa_tpu.consensus import generate_consensus
    for ab in abs_[:4]:
        generate_consensus(ab, params)
        assert ab.cons.n_cons >= 1
    return {
        "value": round(n / e2e, 3),
        "unit": "windows/s",
        "instances": n,
        "length_buckets": 5,
        "e2e_seconds": round(e2e, 3),
        "dp_seconds": round(bp.dp_seconds, 3),
        "dp_busy_seconds": round(bp.dp_busy_seconds(), 3),
        "dp_cells": bp.dp_cells,
        "rounds": bp.rounds,
        "fallbacks": bp.fallbacks,
    }


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    # emit a provisional floor first: any later kill still parses
    emit({"metric": "dp_cells_per_s", "value": 0.0, "unit": "cells/s",
          "vs_baseline": None,
          "extras": {"status": "provisional", "fixture": FIXTURE,
                     "instances": N_INSTANCES, "budget_s": BUDGET_S}})

    # reference first: host-CPU subprocess, no device dependency — and
    # into the provisional record, so a dead device tunnel (the process
    # would block at the first jax device touch until the watchdog
    # fires) still leaves the reference evidence in the parsed line
    ref_wall = _reference_wall(FIXTURE)
    if ref_wall is not None:
        emit({"metric": "dp_cells_per_s", "value": 0.0, "unit": "cells/s",
              "vs_baseline": None,
              "extras": {"status": "provisional", "fixture": FIXTURE,
                         "instances": N_INSTANCES, "budget_s": BUDGET_S,
                         "ref_instances": ref_wall[0],
                         "ref_wall_s": round(ref_wall[1], 3)}})

    # probe the device in a SUBPROCESS first: a dead tunnel blocks
    # jax.devices() indefinitely in-process (no timeout mechanism), and
    # a bench that only ever emits the provisional record when the
    # tunnel is down captures no live measurement at all. On a dead
    # probe, fall back to the CPU platform — clearly labeled — so the
    # harness still produces a real end-to-end number.
    device_fallback = None
    probe_s = float(os.environ.get("ABPOA_BENCH_PROBE_S", "90"))
    if probe_s > 0:
        try:
            pr = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices())"],
                timeout=probe_s, capture_output=True)
            if pr.returncode != 0:
                device_fallback = f"probe rc={pr.returncode}"
        except subprocess.TimeoutExpired:
            device_fallback = f"probe timeout after {probe_s:.0f}s"
    import jax
    if device_fallback:
        emit({"metric": "dp_cells_per_s", "value": 0.0, "unit": "cells/s",
              "vs_baseline": None,
              "extras": {"status": "provisional", "fixture": FIXTURE,
                         "instances": N_INSTANCES, "budget_s": BUDGET_S,
                         "device_fallback":
                             f"cpu ({device_fallback}; tunnel "
                             f"unreachable — measuring the XLA engine "
                             f"on the host CPU instead)"}})
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    from abpoa_tpu.parallel import batch as batch_mod

    reads = _load_reads(FIXTURE)
    instances = [reads] * N_INSTANCES

    # warmup compiles exactly the shape buckets the timed run uses (same
    # instances object); kernel rounds are captured for the chained replay
    batch_mod.KERNEL_CAPTURE = captured = []
    BatchPOA(Params().post_set()).run_consensus(instances)
    batch_mod.KERNEL_CAPTURE = None

    # timed reps: the headline is the MEDIAN rep (min-of-N flattered by
    # 2.3x in round 3). Rep discipline (round-4 verdict): a 1-rep median
    # is not a median — reps run until 3 land or the e2e slice
    # (0.45 x budget, leaving a RESERVED slice for the config-5 seeded
    # phase that was budget-starved two rounds running) is spent;
    # anything under 3 is marked reps_insufficient.
    reps = []
    cons = None
    e2e_slice_end = T_START + 0.45 * BUDGET_S
    while len(reps) < 3:
        bp = BatchPOA(Params().post_set())
        t0 = time.perf_counter()
        c = bp.run_consensus(instances)
        reps.append((time.perf_counter() - t0, bp))
        if cons is None:
            cons = c
            assert all(x == cons[0] for x in cons)
        e2e, best = min(reps, key=lambda x: x[0])
        e2e_med = sorted(r[0] for r in reps)[len(reps) // 2]
        cpi = best.dp_cells // N_INSTANCES
        ref_rate = _reference_cells_per_s(ref_wall, FIXTURE, cpi)
        emit(_headline(best, e2e, ref_rate,
                       {"reps": len(reps),
                        "reps_insufficient": len(reps) < 3,
                        "device_loop": bp.used_device_loop},
                       e2e_med=e2e_med))
        if len(reps) < 3 and time.monotonic() > e2e_slice_end:
            break
    # one-shot opt-in baseline update from the settled best rep
    _reference_cells_per_s(ref_wall, FIXTURE, cpi, update=True)
    extras = {"reps": len(reps), "reps_insufficient": len(reps) < 3,
              "device": str(jax.devices()[0]),
              "device_loop": best.used_device_loop}
    extras.update(_roofline(best.dp_cells / e2e_med))
    if device_fallback:
        extras["device_fallback"] = (
            f"cpu ({device_fallback}) — NOT a TPU number: the tunnel "
            f"was unreachable, this is the XLA engine on the host CPU")

    def _emit():
        emit(_headline(best, e2e, ref_rate, extras, e2e_med=e2e_med))

    # ---- config-5 seeded workload FIRST among the optional phases ----
    # (round-4 verdict: "the north-star workload should not be last in
    # line" — it was budget-starved in rounds 3 and 4 behind the cheap
    # kernel/transport extras; it now gets the whole post-e2e slice)
    n_seeded = int(os.environ.get("ABPOA_BENCH_SEEDED", "1024"))
    if n_seeded and left() > 60:
        try:
            extras["seeded"] = _bench_seeded(reads, n_seeded)
        except Exception as e:
            extras["seeded"] = {"error": repr(e)}
        _emit()

    # ---- phase ledger: DP-only e2e via the graph-kernel ablation ----
    # (the ablation is part of the STATIC loop config, so this compiles
    # its own jit entry and the persistent cache amortizes it across
    # rounds). graph+glue = full - dp_only, the round-5 verdict metric.
    if best.used_device_loop and left() > 90:
        try:
            os.environ["ABPOA_GK_ABLATE"] = "graph"
            os.environ["ABPOA_LOOP_NO_REPLAY"] = "1"
            BatchPOA(Params().post_set()).run_consensus(instances)
            bl = BatchPOA(Params().post_set())
            t0 = time.perf_counter()
            bl.run_consensus(instances)
            dp_only = time.perf_counter() - t0
            extras["ledger"] = {
                "dp_only_e2e_s": round(dp_only, 4),
                "graph_glue_s": round(max(e2e_med - dp_only, 0.0), 4),
                "graph_glue_lt_dp": bool(e2e_med - dp_only < dp_only)}
        except Exception as e:
            extras["ledger"] = {"error": repr(e)}
        finally:
            os.environ.pop("ABPOA_GK_ABLATE", None)
            os.environ.pop("ABPOA_LOOP_NO_REPLAY", None)
        _emit()

    # ---- device-busy at B>=256 (round-3 item 3 at the asked batch) ----
    if best.used_device_loop and left() > 90:
        try:
            big = [reads] * max(256, 4 * N_INSTANCES)
            BatchPOA(Params().post_set()).run_consensus(big)  # compile
            bb = BatchPOA(Params().post_set())
            t0 = time.perf_counter()
            bb.run_consensus(big)
            b_e2e = time.perf_counter() - t0
            extras["b256"] = {
                "instances": len(big),
                "e2e_seconds": round(b_e2e, 4),
                "cells_per_s": round(bb.dp_cells / b_e2e, 1),
                "dp_busy_over_e2e": round(
                    bb.dp_busy_seconds() / b_e2e, 4)}
        except Exception as e:
            extras["b256"] = {"error": repr(e)}
        _emit()

    # ---- heterogeneous batch on the REAL chip (round-4 verdict item 4:
    # mixed read counts/lengths is the production shape; must take the
    # device loop with zero fallbacks). Same shape bucket as the
    # headline run -> no extra compile.
    if best.used_device_loop and left() > 30:
        try:
            mixed = [reads[k % 4:] if k % 4 else reads
                     for k in range(N_INSTANCES)]
            bx = BatchPOA(Params().post_set())
            t0 = time.perf_counter()
            bx.run_consensus(mixed)
            extras["mixed"] = {
                "instances": len(mixed),
                "e2e_seconds": round(time.perf_counter() - t0, 4),
                "device_loop": bx.used_device_loop,
                "fallbacks": bx.fallbacks}
        except Exception as e:
            extras["mixed"] = {"error": repr(e)}
        _emit()

    # ---- best-effort phases; each skips cleanly on low budget ---- #
    if left() > 45:
        try:
            kr = _bench_kernel_rate(captured, reads=reads)
            if kr:
                extras.update(kr)
        except Exception as e:  # never let an extra kill the headline
            extras["kernel_error"] = repr(e)
        _emit()

    if left() > 45:
        try:
            tr = _bench_transport(captured)
            if tr:
                extras["transport"] = tr
                # projected e2e on a directly-attached chip (no tunnel),
                # anchored to MEASURED on-chip quantities: it can be no
                # smaller than the chip's serial kernel time for all
                # rounds (rounds x chained-replay round time, scaled to
                # the mean round's cells) and no larger than the
                # measured e2e (removing transport cannot slow it) —
                # round 3's projection violated that and came out SLOWER
                # than the tunneled measurement.
                if "kernel_round_ms" in extras and best.rounds:
                    mean_cells = best.dp_cells / best.rounds
                    kern_round_s = (extras["kernel_round_ms"] / 1e3
                                    * mean_cells
                                    / extras["kernel_round_cells"])
                    kern_total = kern_round_s * best.rounds
                    floor_s = (tr.get("transport_floor_ms_per_round", 0)
                               / 1e3 * best.rounds)
                    proj = min(e2e, max(kern_total, e2e - floor_s))
                    extras["projected_no_tunnel"] = {
                        "e2e_seconds": round(proj, 4),
                        "kernel_total_seconds": round(kern_total, 4),
                        "cells_per_s": round(best.dp_cells / proj, 1),
                        "vs_baseline": (round(best.dp_cells / proj
                                              / ref_rate, 4)
                                        if ref_rate == ref_rate else None),
                        "rounds": best.rounds}
        except Exception as e:
            extras["transport_error"] = repr(e)
        _emit()

    del captured

    if os.environ.get("ABPOA_BENCH_MESH", "1") == "1" and left() > 60:
        try:
            from jax.sharding import Mesh
            mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
            BatchPOA(Params().post_set(), mesh=mesh).run_consensus(
                instances)
            bm = BatchPOA(Params().post_set(), mesh=mesh)
            t0 = time.perf_counter()
            cons_m = bm.run_consensus(instances)
            mesh_e2e = time.perf_counter() - t0
            assert cons_m == cons
            extras["mesh"] = {"devices": 1,
                              "e2e_seconds": round(mesh_e2e, 4),
                              "windows_per_s": round(
                                  N_INSTANCES / mesh_e2e, 4)}
        except Exception as e:
            extras["mesh"] = {"error": repr(e)}

    _emit()
    _STATE["done"] = True


def _supervise() -> int:
    """Wrapper mode: run the real bench as a CHILD process and enforce
    the wall budget from OUTSIDE. The in-process watchdog thread cannot
    fire if a wedged device call blocks the GIL (observed on this
    harness's tunnel: a dispatch hangs in C and no Python thread runs
    again) — the wrapper still sees the child's emitted records, and on
    a hang it kills the child, re-prints the last record with a
    tunnel_wedged marker, and exits 0 so the driver always gets a
    parseable last line."""
    import signal
    env = dict(os.environ, ABPOA_BENCH_INNER="1")
    proc = subprocess.Popen([sys.executable, __file__], env=env,
                            stdout=subprocess.PIPE, text=True,
                            bufsize=1)
    last = None
    deadline = time.monotonic() + BUDGET_S + 45

    def _drain():
        nonlocal last
        for line in proc.stdout:
            line = line.strip()
            if line:
                print(line, flush=True)
                last = line

    t = threading.Thread(target=_drain, daemon=True)
    t.start()
    while proc.poll() is None and time.monotonic() < deadline:
        time.sleep(1.0)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        rec = {"metric": "dp_cells_per_s", "value": 0.0,
               "unit": "cells/s", "vs_baseline": None, "extras": {}}
        if last:
            try:
                rec = json.loads(last)
            except ValueError:
                pass
        rec.setdefault("extras", {})
        rec["extras"] = dict(rec["extras"], tunnel_wedged=True,
                             budget_exhausted=True)
        print("\n" + json.dumps(rec), flush=True)
    t.join(timeout=5.0)
    return 0


if __name__ == "__main__":
    if os.environ.get("ABPOA_BENCH_INNER") != "1":
        sys.exit(_supervise())
    try:
        main()
    except Exception as e:  # a dead tunnel must still yield a parsed line
        import traceback
        rec = _STATE["record"] or {
            "metric": "dp_cells_per_s", "value": 0.0, "unit": "cells/s",
            "vs_baseline": None, "extras": {}}
        rec = dict(rec)
        tb = traceback.format_exc().splitlines()
        rec["extras"] = dict(rec.get("extras", {}), error=repr(e)[:300],
                             error_at=tb[-3].strip()[:200]
                             if len(tb) >= 3 else "")
        with _EMIT_LOCK:
            print(json.dumps(rec), flush=True)
        _STATE["done"] = True
