#!/usr/bin/env python
"""Differential fuzzer for the device-resident POA loop (ops/poa_loop.py).

Runs device_round EAGERLY (no jit -> no compile cost) with interpret-mode
kernels on CPU against randomized HETEROGENEOUS batches (per-instance
read counts/lengths differ; exhausted instances see qlen-0 masked rounds
— the dispatcher's production shape) x gap modes, asserting after EVERY
round and for EVERY instance:
  * kernel misc best score == oracle best score
  * replayed step-stream cigar == oracle cigar
  * device graph state (CSR incl. list orders + edge weights) == host
  * Kahn topo order, n2i and max_remain == host
  * masked rounds leave the instance's state untouched

Campaign:  python tools/fuzz_device_loop.py --n 50 [--start 0]
A failing seed prints its parameters; rerun with --start SEED --n 1.
The pytest suite runs a fixed-seed slice (tests/test_device_loop.py) and
drives the _DeviceLoop dispatcher itself (test_device_loop_dispatch.py).
"""
from __future__ import annotations

import argparse
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def _gen_instance(rng, L, n_reads, sub_p, ind_p):
    anc = rng.integers(0, 4, L).astype(np.uint8)
    reads = []
    for _ in range(n_reads):
        out = []
        for b in anc:
            r = rng.random()
            if r < ind_p / 2:
                continue
            if r < ind_p:
                out.append(int(rng.integers(0, 4)))
            out.append(int(rng.integers(0, 4)) if rng.random() < sub_p
                       else int(b))
        reads.append(np.asarray(out or [0], dtype=np.uint8))
    return reads


def run_seed(seed: int) -> str:
    import jax
    import jax.numpy as jnp
    from abpoa_tpu.params import Params, SRC_NODE_ID, SINK_NODE_ID
    from abpoa_tpu.graph import POAGraph
    from abpoa_tpu.align.engine_np import (align_sequence_to_subgraph,
                                           score_width_dispatch)
    from abpoa_tpu.align.engine_jax import pick_WB
    from abpoa_tpu.ops import dp_pallas as dpp
    from abpoa_tpu.ops import bt_xla
    from abpoa_tpu.ops import poa_loop as pls

    rng = np.random.default_rng(777_000 + seed)
    # heterogeneous batch: B instances with DIFFERENT read counts and
    # lengths; rounds past an instance's last read are qlen-0 masked
    B = int(rng.integers(1, 3))
    sub_p = float(rng.uniform(0.01, 0.15))
    ind_p = float(rng.uniform(0.0, 0.08))
    gaps = [(4, 2, 24, 1), (4, 2, 0, 0), (0, 2, 0, 0)][seed % 3]
    wb = int(rng.integers(5, 30))
    insts = []
    for _ in range(B):
        n_reads = int(rng.integers(2, 8))
        L = int(rng.integers(40, 300))
        insts.append(_gen_instance(rng, L, n_reads, sub_p, ind_p))
    params = Params(gap_open1=gaps[0], gap_ext1=gaps[1],
                    gap_open2=gaps[2], gap_ext2=gaps[3], wb=wb).post_set()
    maxlen = max(len(q) for reads in insts for q in reads)
    NR = max(len(reads) for reads in insts) - 1
    R = 256 if maxlen < 180 else 512
    bits, pn, _l, inf_min = score_width_dispatch(params, R, maxlen)
    assert bits == 16
    WB = pick_WB(params, maxlen, pn)
    Wq = ((maxlen // 128) + 1) * 128
    Wq = (Wq + WB - 1) // WB * WB
    LS = (R + Wq + 63) // 64 * 64
    cfg = pls.LoopConfig(R=R, E=12, P=8, A=4, Wq=Wq, WB=WB, LS=LS,
                         NR=NR, B=B, G=1, GT=B, pn=pn,
                         inf_min=inf_min, gap_mode=params.gap_mode,
                         use_zdrop=params.zdrop > 0)
    gs = []
    for reads in insts:
        g = POAGraph()
        g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                              None, 0, True)
        g.topological_sort(params)
        gs.append(g)
    st, i2n, n2i, remain = pls.init_state_np(gs, cfg)
    if st.fail.any():
        return "skip (capacity at init)"
    st = jax.tree.map(jnp.asarray, st)
    i2n, n2i, remain = map(jnp.asarray, (i2n, n2i, remain))
    scal_base = jnp.asarray(pls.make_scal_base(params, cfg))
    done = [False] * B
    for r in range(1, NR + 1):
        qc = np.zeros((B, cfg.Wq), np.int8)
        ql = np.zeros(B, np.int32)
        for b, reads in enumerate(insts):
            if r < len(reads):
                q = reads[r]
                qc[b, 1:len(q) + 1] = q
                ql[b] = len(q)
        st2, i2n2, n2i2, remain2, misc, s16 = pls.device_round(
            cfg, st, i2n, n2i, remain, jnp.asarray(qc),
            jnp.asarray(ql), scal_base,
            jnp.int32(params.wb), jnp.int32(round(params.wf * 1000)),
            interpret=True)
        mi = np.asarray(misc)
        st_np = jax.tree.map(np.asarray, st2)
        for b, reads in enumerate(insts):
            g = gs[b]
            if done[b]:
                continue
            if r >= len(reads):
                # masked round: the instance's state must be untouched
                assert st_np.fail[b] == 0, (r, b, "masked fail")
                assert st_np.node_n[b] == g.node_n, (r, b, "masked nn")
                continue
            q = reads[r]
            qlen = len(q)
            if not g.is_topological_sorted:
                g.topological_sort(params)
            res = align_sequence_to_subgraph(g, params, SRC_NODE_ID,
                                             SINK_NODE_ID, q)
            if mi[b, dpp.M_OVFL]:
                # band overflow: the production path falls back; state
                # must be frozen (fail flag) — accept, retire instance
                assert st_np.fail[b] == 1
                done[b] = True
                continue
            assert mi[b, dpp.M_FAIL] == 0, (r, b, "walk fail")
            assert mi[b, dpp.M_BEST] == res.best_score, \
                (r, b, int(mi[b, dpp.M_BEST]), res.best_score)
            nst = int(mi[b, dpp.M_NSTEPS])
            steps32 = bt_xla.unpack_steps16(np.asarray(s16)[b], nst,
                                            int(mi[b, dpp.M_BI]),
                                            int(mi[b, dpp.M_BJ]))
            r2 = type(res)()
            bt_xla.replay_steps(g, params, q, steps32, nst,
                                int(mi[b, dpp.M_BI]),
                                int(mi[b, dpp.M_BJ]),
                                int(mi[b, dpp.M_ENDI]),
                                int(mi[b, dpp.M_ENDJ]), r2)
            assert r2.cigar == res.cigar, (r, b, "cigar")
            g.add_graph_alignment(params, q, [1] * qlen, res.cigar,
                                  None, r, True)
            assert st_np.fail[b] == 0, (r, b, "fail flag")
            c = g.build_csr()
            n = c["n"]
            assert st_np.node_n[b] == n, (r, b, "node_n")
            assert (st_np.bases[b, :n] == c["bases"][:n]).all()
            for name, flat, off, dn, di, dw in (
                    ("out", c["out_flat"], c["out_off"], st_np.n_out,
                     st_np.out_ids, st_np.out_w),
                    ("in", c["in_flat"], c["in_off"], st_np.n_in,
                     st_np.in_ids, None),
                    ("al", c["al_flat"], c["al_off"], st_np.n_al,
                     st_np.al_ids, None)):
                cnt = off[1:] - off[:-1]
                assert (dn[b, :n] == cnt[:n]).all(), (r, b, name)
                for i in range(n):
                    assert (di[b, i, :cnt[i]]
                            == flat[off[i]:off[i + 1]]).all(), \
                        (r, b, name, i)
                    if dw is not None:
                        assert (dw[b, i, :cnt[i]]
                                == c["out_w_flat"][off[i]:off[i + 1]]
                                ).all(), (r, b, "w", i)
            g.topological_sort(params)
            assert (np.asarray(i2n2)[b][:n]
                    == np.asarray(g.index_to_node_id[:n])).all(), \
                (r, b, "i2n")
            assert (np.asarray(n2i2)[b][:n]
                    == np.asarray(g.node_id_to_index[:n])).all(), \
                (r, b, "n2i")
            assert (np.asarray(remain2)[b][:n]
                    == np.asarray(g.node_id_to_max_remain[:n])).all(), \
                (r, b, "remain")
        st, i2n, n2i, remain = st2, i2n2, n2i2, remain2
        if all(done):
            break
    shape = [(len(rr), max(len(q) for q in rr)) for rr in insts]
    return f"ok (B={B} {shape}, gaps={gaps}, wb={wb})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--keep-going", action="store_true")
    a = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    fails = []
    for seed in range(a.start, a.start + a.n):
        try:
            msg = run_seed(seed)
            print(f"seed {seed:4d} {msg}", flush=True)
        except AssertionError as e:
            fails.append(seed)
            print(f"seed {seed:4d} FAIL {e}", flush=True)
            if not a.keep_going:
                sys.exit(1)
    if fails:
        print(f"{len(fails)} failures: {fails}")
        sys.exit(1)
    print("campaign clean")


if __name__ == "__main__":
    main()
