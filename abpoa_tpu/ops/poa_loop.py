"""Device-resident progressive POA loop: DP + backtrack + graph fusion +
re-toposort all on device, ONE dispatch for the whole multi-read loop.

The round-based host loop (parallel/batch.py) pays one host<->device round
trip per POA round because graph fusion and the re-sort run on the host;
through this harness's ~25 ms-RTT tunnel that transport floor dominates
e2e (round-3 verdict). This module removes the host from the loop:

  round r (inside ONE jitted lax.scan):
    [Pallas] banded DP sweep + in-kernel backtrack  (ops/dp_pallas_band)
    [XLA]    VECTORIZED fusion of the step stream into the graph state
    [Pallas] Kahn FIFO toposort with aligned-node grouping (scalar SMEM)
    [XLA]    max_remain via pointer doubling on the heaviest-edge forest
    [XLA]    re-export of the DP planes in the new topo order (gathers)

Only the compact per-round step streams + misc cross the link, once, at
the end; the host then REPLAYS them through the native C fusion
(graph.fuse_steps) to rebuild the authoritative host graph for
consensus/MSA/GFA — so a device-side fusion bug can never corrupt
outputs silently, it only desynchronizes the DP inputs and is caught by
the byte-parity tests/fuzzer.

Reference semantics being replicated bit-exactly (all orders are
byte-parity-critical):
  * fusion rules     ref src/abpoa_graph.c:596-672 (via native/poagraph.c
                     pg_fuse_steps — the forward replay of the reversed
                     step stream with leading/trailing insertions)
  * Kahn FIFO order  ref src/abpoa_graph.c:186-231 (aligned grouping)
  * max_remain       ref src/abpoa_graph.c:233-274 (heaviest-out-edge
                     chase; the BFS there is pure scheduling, the values
                     are order-independent -> parallel pointer doubling)

Key vectorization insight (why fusion needs NO sequential scan): within
one read's fusion every list that is READ (out-edge search, aligned-node
search, base compare) is read BEFORE it can be modified by the same
fusion — the alignment path visits each node at most once. So every
step's node resolution depends only on the PRE-fusion state: new-node
ids come from a prefix count, the last_id chain is a masked
fill-forward, and all mutations apply as batched scatters afterwards.

Scope: global align mode, banded (wb >= 0), any gap mode, m == 5, unit
or qv per-base weights (wmode=1: wide out-edge words so max_remain's
heaviest-edge chase stays bit-faithful), amb_strand (device runs
fw-only; the replay applies the reference ambiguity threshold per round
and finishes flagged instances through the sequential fwd+rc body). No
incremental restore (rid0 != 0): that stays on the round-based host
loop. Per-instance failures (band overflow, walk dead end, capacity
overflow) set a sticky flag; the host re-runs those instances on the
bit-exact oracle.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

from ..params import SRC_NODE_ID, SINK_NODE_ID, GLOBAL_MODE


class LoopConfig(NamedTuple):
    R: int          # node-id capacity == DP row capacity
    E: int          # out-degree capacity
    P: int          # in-degree capacity (DP kernel pre slots)
    A: int          # aligned-list capacity (m=5 -> 4 is exact)
    Wq: int         # padded query width
    WB: int         # band tile width
    LS: int         # step-stream capacity (= bt_lmax of the DP kernel)
    NR: int         # number of device rounds (reads 1..NR)
    B: int          # batch
    G: int          # DP kernel packing
    GT: int         # topo kernel packing
    pn: int
    inf_min: int
    gap_mode: int
    use_zdrop: bool
    wbits: int = 4   # out-edge weight bits packed above the 16-wbits id
    #                  bits in the graph kernel (unit weights: max edge
    #                  weight = reads per instance; dispatcher sizes it)
    wmode: int = 0   # 0 = unit weights, out entries are 16-bit halves
    #                  (id | w<<(16-wbits)); 1 = qv weights, out entries
    #                  are FULL words (id | w<<16, weight < 2^15, edge
    #                  sums bounded by the dispatcher) and a per-base
    #                  weight stream (qw halves) feeds the fusion
    #                  (ref weight[q] per resolving edge,
    #                  native/poagraph.c pg_add_graph_sequence)
    gk: str = "smem"  # graph-kernel state residency (see GK_IMPL)
    abl: str = ""     # comma phase-ablation list (probes only; see
    #                   _ablated) — in the static config so jit caches
    #                   key it
    dv: int = 0       # DP sweep scalar variant (BandConfig.dv)
    gv: int = 0       # graph-kernel scalar search variant (on-chip A/B,
    #                   round 5): 0 = semantic gates (skip aligned
    #                   search on base match, skip edge search on new
    #                   from-node) + branchless inner where-chains —
    #                   the chains pipeline their SMEM loads; 1 = fully
    #                   pl.when-guarded inner loops (parity with 0);
    #                   2 = slot-0 probe + guarded fallback (~0.2 s
    #                   WORSE at B=64: scalar branches serialize loads)


class GState(NamedTuple):
    """Per-instance graph state, all [B, ...]; node ids are array rows."""
    bases: "jax.Array"    # [B, R] i32
    out_ids: "jax.Array"  # [B, R, E] i32
    out_w: "jax.Array"    # [B, R, E] i32
    n_out: "jax.Array"    # [B, R] i32
    in_ids: "jax.Array"   # [B, R, P] i32
    n_in: "jax.Array"     # [B, R] i32
    al_ids: "jax.Array"   # [B, R, A] i32
    n_al: "jax.Array"     # [B, R] i32
    node_n: "jax.Array"   # [B] i32
    fail: "jax.Array"     # [B] i32 (sticky)


# ------------------------------------------------------------------ #
# vectorized fusion (XLA)

def _take1(arr, idx):
    """Batched gather arr[b, idx[b, k]] -> [B, K]; idx clipped (callers
    mask invalid lanes)."""
    import jax.numpy as jnp
    return jnp.take_along_axis(arr, jnp.clip(idx, 0, arr.shape[1] - 1),
                               axis=1)


def fuse_batch(cfg: LoopConfig, st: GState, i2n, steps, misc, qcodes,
               qlen):
    """Fuse one round's backtrack step streams into the graph state.

    steps: [B, LS] packed int32 (op|row<<2|col<<14) in PUSH (reverse)
    order; misc: [B, M_NMISC]; qcodes: [B, Wq] with query at [1..qlen];
    qlen: [B] (0 = no read this round -> no-op); i2n: [B, R] topo map the
    DP ran with. Unit weights (scope guard in the dispatcher)."""
    import jax.numpy as jnp
    from . import dp_pallas as dpp
    B, R, E, P, A = cfg.B, cfg.R, cfg.E, cfg.P, cfg.A
    LS = cfg.LS
    LF = LS  # forward length <= qlen + n_rows <= Wq + R <= LS by choice
    i32 = jnp.int32
    bi = misc[:, dpp.M_BI]
    bj = misc[:, dpp.M_BJ]
    ej = misc[:, dpp.M_ENDJ]
    nst = misc[:, dpp.M_NSTEPS]
    bad = (misc[:, dpp.M_OVFL] | misc[:, dpp.M_FAIL]) > 0
    ops = steps & 3
    rows = (steps >> 2) & 0xFFF
    cols = steps >> 14

    lead = jnp.maximum(ej, 0)
    trail = jnp.maximum(qlen - bj, 0)
    live_n = lead + nst + trail
    inst_ok = (qlen > 0) & jnp.logical_not(bad) & (st.fail == 0) \
        & (live_n > 0)

    k = jnp.arange(LF, dtype=i32)[None, :]                  # [1, LF]
    in_lead = k < lead[:, None]
    in_steps = (k >= lead[:, None]) & (k < (lead + nst)[:, None])
    in_trail = (k >= (lead + nst)[:, None]) & (k < live_n[:, None])
    live = (in_lead | in_steps | in_trail) & inst_ok[:, None]
    s = jnp.clip((nst - 1)[:, None] - (k - lead[:, None]), 0, LS - 1)
    op_k = _take1(ops, s)
    row_k = _take1(rows, s)
    col_k = _take1(cols, s)
    is_m = live & in_steps & (op_k == 0)
    is_i = live & (in_lead | in_trail | (in_steps & (op_k == 1)))

    qid = jnp.where(in_lead, k,
                    jnp.where(in_trail,
                              bj[:, None] + k - (lead + nst)[:, None],
                              col_k - 1))
    qbase = _take1(qcodes.astype(i32), qid + 1)             # seq[qid]

    nid = _take1(i2n, row_k)                                # M-step node
    gb = _take1(st.bases, nid)
    mism = is_m & (gb != qbase)
    # aligned-node search (first member whose base matches, list order;
    # ref src/abpoa_graph.c:377-401)
    als = jnp.take_along_axis(
        st.al_ids, jnp.clip(nid, 0, R - 1)[:, :, None], axis=1)  # [B,LF,A]
    al_n_v = _take1(st.n_al, nid)
    al_b = _take1(st.bases, als.reshape(B, LF * A)).reshape(B, LF, A)
    a_iota = jnp.arange(A, dtype=i32)[None, None, :]
    hit = (a_iota < al_n_v[:, :, None]) & (al_b == qbase[:, :, None])
    first_a = jnp.argmax(hit, axis=2).astype(i32)
    has_aid = jnp.any(hit, axis=2)
    aid = jnp.take_along_axis(als, first_a[:, :, None], axis=2)[:, :, 0]

    is_new = live & (is_i | (mism & jnp.logical_not(has_aid)))
    new_id = st.node_n[:, None] + jnp.cumsum(is_new, axis=1) - 1
    resolved = jnp.where(is_new, new_id,
                         jnp.where(mism, aid, nid))
    has_res = is_m | is_i

    # last_id fill-forward: from[k] = resolved at the previous resolving
    # step, SRC before any (ref pg_fuse_steps last_id chain)
    import jax
    r_idx = jnp.where(has_res, jnp.broadcast_to(k, (B, LF)), -1)
    run = jax.lax.associative_scan(jnp.maximum, r_idx, axis=1)
    prefix = jnp.concatenate([jnp.full((B, 1), -1, i32), run[:, :-1]], 1)
    frm = jnp.where(prefix >= 0,
                    _take1(resolved, jnp.maximum(prefix, 0)),
                    jnp.int32(SRC_NODE_ID))

    # final edge last -> SINK (weight[qlen-1] = 1 unit)
    last_final = jnp.where(run[:, -1] >= 0,
                           _take1(resolved,
                                  jnp.maximum(run[:, -1:], 0))[:, 0],
                           jnp.int32(SRC_NODE_ID))

    # edge events: every resolving step + the final edge as slot LF
    eu = jnp.concatenate([frm, last_final[:, None]], axis=1)      # [B,LF+1]
    ev = jnp.concatenate(
        [resolved, jnp.full((B, 1), SINK_NODE_ID, i32)], axis=1)
    e_live = jnp.concatenate([has_res, inst_ok[:, None]], axis=1)

    n0 = st.node_n[:, None]
    # out-edge search in the PRE state (check_edge iff from-node is old;
    # a new to-node can never be present, the search just misses)
    out_u = _take1(st.out_ids.reshape(B, R * E),
                   (jnp.clip(eu, 0, R - 1)[:, :, None] * E
                    + jnp.arange(E, dtype=i32)[None, None, :]
                    ).reshape(B, -1)).reshape(B, LF + 1, E)
    nout_u = _take1(st.n_out, eu)
    e_iota = jnp.arange(E, dtype=i32)[None, None, :]
    ehit = (e_iota < nout_u[:, :, None]) & (out_u == ev[:, :, None]) \
        & (eu < n0)[:, :, None]
    found = jnp.any(ehit, axis=2)
    slot_f = jnp.argmax(ehit, axis=2).astype(i32)
    bump = e_live & found
    newe = e_live & jnp.logical_not(found)

    nin_v = _take1(st.n_in, ev)
    cap_fail = jnp.any(newe & ((nout_u >= E) | (nin_v >= P)), axis=1)

    flat_bump = jnp.where(bump, jnp.clip(eu, 0, R - 1) * E + slot_f,
                          R * E)
    out_w = st.out_w.reshape(B, R * E).at[
        jnp.arange(B)[:, None], flat_bump].add(
        jnp.where(bump, 1, 0), mode="drop").reshape(B, R, E)
    flat_new = jnp.where(newe,
                         jnp.clip(eu, 0, R - 1) * E
                         + jnp.clip(nout_u, 0, E - 1), R * E)
    bI = jnp.arange(B)[:, None]
    out_ids = st.out_ids.reshape(B, R * E).at[bI, flat_new].set(
        jnp.where(newe, ev, 0), mode="drop").reshape(B, R, E)
    out_w = out_w.reshape(B, R * E).at[bI, flat_new].set(
        jnp.where(newe, 1, 0), mode="drop").reshape(B, R, E)
    n_out = st.n_out.at[bI, jnp.where(newe, jnp.clip(eu, 0, R - 1), R)
                        ].add(jnp.where(newe, 1, 0), mode="drop")
    flat_in = jnp.where(newe,
                        jnp.clip(ev, 0, R - 1) * P
                        + jnp.clip(nin_v, 0, P - 1), R * P)
    in_ids = st.in_ids.reshape(B, R * P).at[bI, flat_in].set(
        jnp.where(newe, eu, 0), mode="drop").reshape(B, R, P)
    n_in = st.n_in.at[bI, jnp.where(newe, jnp.clip(ev, 0, R - 1), R)
                      ].add(jnp.where(newe, 1, 0), mode="drop")

    # new node bases
    bases = st.bases.at[bI, jnp.where(is_new, jnp.clip(new_id, 0, R - 1),
                                      R)].set(
        jnp.where(is_new, qbase, 0), mode="drop")

    # aligned bundling for mismatch-created nodes (all-pairs linking,
    # ref src/abpoa_graph.c:377-401): each existing member m of
    # group(nid) appends new_id; the new node's list is
    # [members in order..., nid]
    mk = mism & is_new
    # members: als (a < al_n_v) then nid
    memb = jnp.concatenate([als, nid[:, :, None]], axis=2)  # [B,LF,A+1]
    m_valid = jnp.concatenate(
        [jnp.broadcast_to(a_iota < al_n_v[:, :, None], (B, LF, A)),
         jnp.ones((B, LF, 1), bool)], axis=2) & mk[:, :, None]
    nal_m = _take1(st.n_al, memb.reshape(B, -1)).reshape(B, LF, A + 1)
    al_cap_fail = jnp.any(m_valid & (nal_m >= A), axis=(1, 2))
    flat_al = jnp.where(
        m_valid,
        jnp.clip(memb, 0, R - 1) * A + jnp.clip(nal_m, 0, A - 1),
        R * A).reshape(B, -1)
    al_ids = st.al_ids.reshape(B, R * A).at[bI, flat_al].set(
        jnp.broadcast_to(jnp.where(mk, new_id, 0)[:, :, None],
                         (B, LF, A + 1)).reshape(B, -1),
        mode="drop")
    n_al = st.n_al.reshape(B, R).at[
        bI, jnp.where(m_valid, jnp.clip(memb, 0, R - 1), R).reshape(B, -1)
    ].add(jnp.where(m_valid, 1, 0).reshape(B, -1), mode="drop")
    # the new node's own list: [als[0..al_n_v-1], nid]
    nl_val = jnp.concatenate([als, nid[:, :, None]], axis=2)
    nl_pos = jnp.concatenate(
        [jnp.broadcast_to(a_iota, (B, LF, A)), al_n_v[:, :, None]],
        axis=2)
    nl_valid = jnp.concatenate(
        [a_iota < al_n_v[:, :, None],
         jnp.ones((B, LF, 1), bool)], axis=2) & mk[:, :, None]
    flat_nl = jnp.where(
        nl_valid,
        jnp.clip(new_id, 0, R - 1)[:, :, None] * A
        + jnp.clip(nl_pos, 0, A - 1), R * A).reshape(B, -1)
    al_ids = al_ids.at[bI, flat_nl].set(
        jnp.where(nl_valid, nl_val, 0).reshape(B, -1), mode="drop")
    n_al = n_al.at[bI, jnp.where(mk, jnp.clip(new_id, 0, R - 1), R)].set(
        jnp.where(mk, al_n_v + 1, 0), mode="drop")

    n_new = jnp.sum(is_new, axis=1)
    node_n = st.node_n + jnp.where(inst_ok, n_new, 0)
    fail = st.fail | (inst_ok & (cap_fail | al_cap_fail
                                 | (node_n > R))).astype(jnp.int32) \
        | (bad & (qlen > 0)).astype(jnp.int32)

    # freeze failed/bad instances: keep the previous state wholesale
    keep = (inst_ok & jnp.logical_not(cap_fail | al_cap_fail
                                      | (node_n > R)))

    def sel(new, old):
        return jnp.where(
            keep.reshape((B,) + (1,) * (new.ndim - 1)), new, old)

    return GState(sel(bases, st.bases).reshape(B, R),
                  sel(out_ids, st.out_ids), sel(out_w, st.out_w),
                  sel(n_out, st.n_out), sel(in_ids, st.in_ids),
                  sel(n_in, st.n_in),
                  sel(al_ids.reshape(B, R, A), st.al_ids),
                  sel(n_al, st.n_al),
                  jnp.where(keep, node_n, st.node_n), fail)


# ------------------------------------------------------------------ #
# Kahn FIFO toposort with aligned grouping (Pallas, scalar SMEM)

def make_topo_kernel(cfg: LoopConfig):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    R, E, A, G = cfg.R, cfg.E, cfg.A, cfg.GT
    E2 = E // 2
    A2 = (A + 1) // 2
    IDM = 0xFFFF    # topo-only kernel: halves carry plain node ids

    def kernel(outp, alp, noa, indeg_in, nn, i2n_o, n2i_o, ok_o,
               indeg, q, stv):
        # copy in-degrees into mutable scratch (input blocks are const)
        def cp(t, c):
            for g in range(G):
                indeg[g, t] = indeg_in[0, g, t]
            return c
        jax.lax.fori_loop(0, R, cp, 0)
        (SV_HEAD, SV_TAIL, SV_IDX, SV_DONE) = range(4)
        for g in range(G):
            q[g, 0] = SRC_NODE_ID
            stv[g, SV_HEAD] = 0
            stv[g, SV_TAIL] = 1
            stv[g, SV_IDX] = 0
            stv[g, SV_DONE] = 0

        def out_at(g, u, e):
            w = outp[0, g, u * E2 + (e >> 1)]
            return (w >> (16 * (e & 1))) & IDM

        def al_at(g, u, a):
            w = alp[0, g, u * A2 + (a >> 1)]
            return (w >> (16 * (a & 1))) & 0xFFFF

        def pop(g):
            head = stv[g, SV_HEAD]
            idx = stv[g, SV_IDX]
            cur = q[g, head]
            i2n_o[0, g, idx] = cur
            n2i_o[0, g, cur] = idx
            stv[g, SV_HEAD] = head + 1
            stv[g, SV_IDX] = idx + 1
            stv[g, SV_DONE] = jnp.where(cur == SINK_NODE_ID, 1, 0)

            @pl.when(cur != SINK_NODE_ID)
            def _():
                w = noa[0, g, cur]
                no = w & 0xFF
                for e in range(E):
                    @pl.when(e < no)
                    def _(e=e):
                        v = out_at(g, cur, e)
                        d = indeg[g, v] - 1
                        indeg[g, v] = d

                        @pl.when(d == 0)
                        def _(v=v):
                            na_v = (noa[0, g, v] >> 8) & 0xFF
                            rdy = jnp.int32(1)
                            for a in range(A):
                                av = al_at(g, v, a)
                                rdy = rdy & jnp.where(
                                    a >= na_v, 1,
                                    (indeg[g, av] == 0)
                                    .astype(jnp.int32))

                            @pl.when(rdy > 0)
                            def _(v=v, na_v=na_v):
                                t0 = stv[g, SV_TAIL]
                                q[g, t0] = v
                                for a in range(A):
                                    @pl.when(a < na_v)
                                    def _(a=a):
                                        q[g, t0 + 1 + a] = al_at(g, v, a)
                                stv[g, SV_TAIL] = t0 + 1 + na_v

        # multiple pops per while iteration: a pop pushes its ready
        # successors BEFORE the next pop's head<tail check, so chain
        # graphs (the common case) advance KP nodes per trip and the
        # loop overhead amortizes KP ways
        KP = 4

        def body(alive):
            for _ in range(KP):
                for g in range(G):
                    @pl.when((stv[g, SV_DONE] == 0)
                             & (stv[g, SV_HEAD] < stv[g, SV_TAIL]))
                    def _(g=g):
                        pop(g)
            na = jnp.int32(0)
            for g in range(G):
                na += jnp.where((stv[g, SV_DONE] == 0)
                                & (stv[g, SV_HEAD] < stv[g, SV_TAIL]),
                                1, 0)
            return na

        jax.lax.while_loop(lambda a: a > 0, body, jnp.int32(G))
        for g in range(G):
            ok = (stv[g, SV_DONE] > 0) & (stv[g, SV_IDX] == nn[0, g, 0])
            ok_o[0, g, 0] = ok.astype(jnp.int32)
    return kernel


def topo_batch(cfg: LoopConfig, st: GState, interpret=False):
    """Batched FIFO Kahn (ref src/abpoa_graph.c:186-231). Returns
    (i2n [B,R], n2i [B,R], ok [B]); rows past node_n are garbage and
    must be masked by callers."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, R, E, A, G = cfg.B, cfg.R, cfg.E, cfg.A, cfg.GT
    assert B % G == 0 and E % 2 == 0
    NP_ = B // G
    i32 = jnp.int32
    oi = st.out_ids.astype(i32) & 0xFFFF
    outp = (oi[:, :, 0::2] | (oi[:, :, 1::2] << 16)).reshape(B, R * E // 2)
    A2 = (A + 1) // 2
    alpad = jnp.concatenate(
        [st.al_ids.astype(i32) & 0xFFFF,
         jnp.zeros((B, R, A2 * 2 - A), i32)], axis=2)
    alp = (alpad[:, :, 0::2] | (alpad[:, :, 1::2] << 16)
           ).reshape(B, R * A2)
    noa = st.n_out.astype(i32) | (st.n_al.astype(i32) << 8)
    indeg = st.n_in.astype(i32)
    nn = st.node_n.astype(i32).reshape(B, 1)

    def grp(x):
        return x.reshape(NP_, G, -1)

    def smem(k):
        return pl.BlockSpec((1, G, k), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)

    kern = make_topo_kernel(cfg)
    out_shapes = (jax.ShapeDtypeStruct((NP_, G, R), i32),
                  jax.ShapeDtypeStruct((NP_, G, R), i32),
                  jax.ShapeDtypeStruct((NP_, G, 1), i32))
    outs = pl.pallas_call(
        kern,
        grid=(NP_,),
        out_shape=out_shapes,
        in_specs=[smem(R * E // 2), smem(R * A2), smem(R), smem(R),
                  smem(1)],
        out_specs=(smem(R), smem(R), smem(1)),
        scratch_shapes=[pltpu.SMEM((G, R), i32),   # indeg (mutable)
                        pltpu.SMEM((G, R), i32),   # queue
                        pltpu.SMEM((G, 4), i32)],  # head/tail/idx/done
        interpret=interpret,
    )(grp(outp), grp(alp), grp(noa), grp(indeg), grp(nn))
    i2n, n2i, ok = outs
    return (i2n.reshape(B, R), n2i.reshape(B, R),
            ok.reshape(B) * (st.fail == 0))


# ------------------------------------------------------------------ #
# max_remain by pointer doubling (values of ref src/abpoa_graph.c:233-274)

def remain_batch(cfg: LoopConfig, st: GState):
    import jax.numpy as jnp
    B, R, E = cfg.B, cfg.R, cfg.E
    i32 = jnp.int32
    e_iota = jnp.arange(E, dtype=i32)[None, None, :]
    valid = e_iota < st.n_out[:, :, None]
    # first-max tie-break: maximize (w, -e) lexicographically
    key = jnp.where(valid, st.out_w * E + (E - 1 - e_iota), -1)
    slot = jnp.argmax(key, axis=2).astype(i32)
    nxt = jnp.take_along_axis(st.out_ids.astype(i32), slot[:, :, None],
                              axis=2)[:, :, 0]
    rid = jnp.arange(R, dtype=i32)[None, :]
    nxt = jnp.where(rid == SINK_NODE_ID, SINK_NODE_ID, nxt)
    nxt = jnp.where(jnp.any(valid, 2) | (rid == SINK_NODE_ID), nxt,
                    SINK_NODE_ID)  # padding rows: harmless self-ish
    d = jnp.where(rid == SINK_NODE_ID, 0, 1).astype(i32)
    d = jnp.broadcast_to(d, (B, R))
    steps = max(1, (R - 1).bit_length())
    for _ in range(steps):
        d = d + _take1(d, nxt)
        nxt = _take1(nxt, nxt)
    return d - 1   # remain[SINK] = -1 (ref :244)


# ------------------------------------------------------------------ #
# DP plane re-export in topo order (gathers)

def build_dp_inputs(cfg: LoopConfig, st: GState, i2n, n2i, remain,
                    qlen, scal_base, wb, wf1000):
    """Build the band kernel's per-round inputs on device.

    scal_base: [S_NSCAL + m*m] int32 template with the static params
    slots (gaps, zdrop, matrix, inf_min) prefilled; per-instance slots
    (qlen, n_rows, w, dpsn, remain_end) are set here. wf1000 =
    round(wf*1000): w = wb + (wf1000*qlen)//1000 matches the host's
    int(wf*qlen) for the reference's wf=0.01 and qlen < 2**31/1000.
    Mirrors engine_jax.export_dense + make_pallas_inputs."""
    import jax.numpy as jnp
    from . import dp_pallas as dpp
    B, R, P = cfg.B, cfg.R, cfg.P
    i32 = jnp.int32
    t = jnp.arange(R, dtype=i32)[None, :]
    live = t < st.node_n[:, None]
    nid = jnp.where(live, i2n, 0)
    bases_row = jnp.where(live, _take1(st.bases, nid), 0)
    pre_nn = jnp.where(live, _take1(st.n_in, nid), 0)
    pre_raw = jnp.take_along_axis(
        st.in_ids.astype(i32), jnp.clip(nid, 0, R - 1)[:, :, None],
        axis=1)                                            # [B, R, P]
    pre_top = _take1(n2i, pre_raw.reshape(B, R * P)).reshape(B, R, P)
    p_iota = jnp.arange(P, dtype=i32)[None, None, :]
    pre_idx = jnp.where(live[:, :, None] & (p_iota < pre_nn[:, :, None]),
                        pre_top, 0)
    remain_row = jnp.where(live, _take1(remain, nid), 0)

    scal = jnp.broadcast_to(scal_base[None, :],
                            (B, scal_base.shape[0])).astype(i32)
    scal = scal.at[:, dpp.S_W].set(wb + (wf1000 * qlen) // 1000)
    scal = scal.at[:, dpp.S_QLEN].set(qlen)
    scal = scal.at[:, dpp.S_NROWS].set(st.node_n)
    scal = scal.at[:, dpp.S_DPSN].set(qlen // cfg.pn + 1)
    scal = scal.at[:, dpp.S_REMEND].set(
        _take1(remain_row, st.node_n[:, None] - 1)[:, 0])
    return scal, bases_row, pre_idx, pre_nn, remain_row


# re-exported for the dispatcher
__all__ = ["LoopConfig", "GState", "fuse_batch", "topo_batch",
           "remain_batch", "build_dp_inputs"]


# ------------------------------------------------------------------ #
# one full device round + the scanned loop

# phase-ablation switch for performance attribution (bench/debug only):
# items in this set are SKIPPED inside device_round — results are wrong,
# timings isolate the remaining phases. e.g. {"topo"} or {"fuse","topo"}.
ABLATE: frozenset = frozenset()

# fusion/toposort implementation: "kernel" = the merged scalar-SMEM
# Pallas graph kernel (one program, ~5x cheaper than the XLA scatters
# on TPU); "xla" = the vectorized fuse_batch + topo_batch pair (kept as
# the cross-checked second implementation; tests compare both).
FUSE_IMPL = "kernel"


def _band_cfg(cfg: LoopConfig, nid: bool):
    from .dp_pallas_band import BandConfig
    return BandConfig(gap_mode=cfg.gap_mode, align_mode=GLOBAL_MODE,
                      pn=cfg.pn, R=cfg.R, WB=cfg.WB, Wq=cfg.Wq, P=cfg.P,
                      O=2, m=5, use_zdrop=cfg.use_zdrop, bt_lmax=cfg.LS,
                      G=cfg.G, fresh=True, nid=nid,
                      dv=getattr(cfg, "dv", 0))


def build_scal(cfg: LoopConfig, ps: PackedState, qlen, scal_base, wb,
               wf1000):
    """Per-round scal rows from the carry: the only XLA glue left
    between the two kernels. w = wb + (wf1000*qlen)//1000 matches the
    host's int(wf*qlen) for the reference's wf=0.01 and qlen < 2**31/1000
    (mirrors build_dp_inputs, which the packed path replaces)."""
    import jax.numpy as jnp
    from . import dp_pallas as dpp
    B = ps.ctrl.shape[0]
    i32 = jnp.int32
    scal = jnp.broadcast_to(scal_base[None, :dpp.S_NSCAL],
                            (B, dpp.S_NSCAL)).astype(i32)
    scal = scal.at[:, dpp.S_W].set(wb + (wf1000 * qlen) // 1000)
    scal = scal.at[:, dpp.S_QLEN].set(qlen)
    scal = scal.at[:, dpp.S_NROWS].set(ps.node_n)
    scal = scal.at[:, dpp.S_DPSN].set(qlen // cfg.pn + 1)
    # remain of the last topo node (== SINK == -1 for whole-graph
    # alignments; kept exact for future subgraph-rooted rounds)
    lastn = _take1(ps.i2nn & 0xFFFF,
                   jnp.maximum(ps.node_n - 1, 0)[:, None])
    scal = scal.at[:, dpp.S_REMEND].set(
        _take1(ps.ctrl >> 16, lastn)[:, 0])
    return scal


def device_round_packed(cfg: LoopConfig, ps: PackedState, qlen, qpf, qp4,
                        scal_base, wb, wf1000, qw=None, interpret=False):
    """One POA round entirely on device, zero-glue form: the nid-mode DP
    kernel reads the packed graph state directly (node-id planes), emits
    the wire-format steps16 halves, and the merged graph kernel consumes
    them in place — the only XLA between them is the scal build."""
    import jax
    from .dp_pallas_band import band_poa_dp_packed
    scal = build_scal(cfg, ps, qlen, scal_base, wb, wf1000)
    bc = _band_cfg(cfg, nid=True)
    misc, s16w = band_poa_dp_packed(bc, scal, ps.ctrl, ps.inp, ps.i2nn,
                                    qpf, interpret=interpret)
    # keep the scan's ys update-slice OUT of the pallas fusion: XLA
    # otherwise fuses the DUS into the custom call and re-scopes its
    # VMEM budget to the 16 MB default, which the plane scratch blows
    # ("should not be possible to run out of scoped vmem" at compile)
    misc, s16w = jax.lax.optimization_barrier((misc, s16w))
    if _ablated(cfg, "graph"):   # attribution probe: DP-only timing
        return ps, misc, s16w
    ps2 = graph_update_packed(cfg, ps, s16w, misc, qlen, qp4, qw=qw,
                              interpret=interpret)
    return ps2, misc, s16w


def device_round(cfg: LoopConfig, st: GState, i2n, n2i, remain, qcodes,
                 qlen, scal_base, wb, wf1000, interpret=False):
    """One POA round entirely on device (GState API for tests/fuzzers).
    FUSE_IMPL "kernel" routes through the packed zero-glue path the
    production scan runs; "xla"/ABLATE keep the cross-checked vectorized
    implementations (fuse_batch + topo_batch + remain_batch)."""
    import jax.numpy as jnp
    from .dp_pallas_band import band_poa_dp_batch, build_qpf
    if FUSE_IMPL == "kernel" and not ABLATE:
        from . import dp_pallas as dpp
        bc = _band_cfg(cfg, nid=True)
        ps = pack_state(cfg, st, i2n, n2i, remain)
        qpf = build_qpf(bc, scal_base[dpp.S_NSCAL:], qcodes)
        qp4 = pack_qp4(cfg, qcodes)
        ps2, misc, s16w = device_round_packed(
            cfg, ps, qlen, qpf, qp4, scal_base, wb, wf1000,
            interpret=interpret)
        st2, i2n2, n2i2, remain2 = unpack_state(cfg, ps2)
        return st2, i2n2, n2i2, remain2, misc, s16w_to_s16(s16w)
    B = cfg.B
    i8 = jnp.int8
    i16 = jnp.int16
    scal, bases_row, pre_idx, pre_nn, remain_row = build_dp_inputs(
        cfg, st, i2n, n2i, remain, qlen, scal_base, wb, wf1000)
    bc = _band_cfg(cfg, nid=False)
    dummy = jnp.zeros((B, 1), i8)
    out = band_poa_dp_batch(
        bc, scal, bases_row.astype(i8),
        pre_idx.reshape(B, cfg.R * cfg.P).astype(i16),
        pre_nn.astype(i8), dummy, dummy, remain_row.astype(i16),
        qcodes.astype(i8), dummy, dummy, dummy, interpret=interpret)
    if "fuse" in ABLATE:
        st2 = st
    else:
        st2 = fuse_batch(cfg, st, i2n, out.steps, out.misc, qcodes,
                         qlen)
    if "topo" in ABLATE:
        i2n2, n2i2 = i2n, n2i
    else:
        i2n2, n2i2, ok = topo_batch(cfg, st2, interpret=interpret)
        fail = st2.fail | ((ok == 0) & (qlen > 0)).astype(jnp.int32)
        st2 = st2._replace(fail=fail)
    remain2 = remain if "remain" in ABLATE else remain_batch(cfg, st2)
    return st2, i2n2, n2i2, remain2, out.misc, out.steps16


def poa_device_loop(cfg: LoopConfig, st0: GState, i2n0, n2i0, remain0,
                    qcodes_rounds, qlen_rounds, scal_base, wb, wf1000,
                    qw_rounds=None, interpret=False):
    """lax.scan over NR rounds on the PACKED carry; ONE dispatch. The
    query-profile folds and packed query codes for ALL rounds are
    precomputed before the scan (they depend only on the xs). Returns
    (final PackedState, misc [NR, B, M_NMISC], steps16 [NR, B, LS])."""
    import jax
    from .dp_pallas_band import build_qpf
    from . import dp_pallas as dpp
    ps0 = pack_state(cfg, st0, i2n0, n2i0, remain0)
    bc = _band_cfg(cfg, nid=True)
    qpf_rounds = build_qpf(bc, scal_base[dpp.S_NSCAL:], qcodes_rounds)
    qp4_rounds = pack_qp4(cfg, qcodes_rounds)
    if cfg.wmode:
        qw2_rounds = pack_qw(cfg, qw_rounds)

        def body(ps, xs):
            ql, qpf, qp4, qw2 = xs
            ps2, misc, s16 = device_round_packed(
                cfg, ps, ql, qpf, qp4, scal_base, wb, wf1000, qw=qw2,
                interpret=interpret)
            return ps2, (misc, s16)

        psF, (misc, s16) = jax.lax.scan(
            body, ps0, (qlen_rounds, qpf_rounds, qp4_rounds,
                        qw2_rounds))
        return psF, misc, s16

    def body(ps, xs):
        ql, qpf, qp4 = xs
        ps2, misc, s16 = device_round_packed(
            cfg, ps, ql, qpf, qp4, scal_base, wb, wf1000,
            interpret=interpret)
        return ps2, (misc, s16)

    psF, (misc, s16) = jax.lax.scan(
        body, ps0, (qlen_rounds, qpf_rounds, qp4_rounds))
    return psF, misc, s16


_LOOP_JIT_CACHE: dict = {}


def poa_device_loop_jit(cfg: LoopConfig, interpret=False):
    """Process-global jitted loop per static config (a fresh jit object
    every call would retrace)."""
    import jax
    key = (cfg, interpret)
    if key not in _LOOP_JIT_CACHE:
        _LOOP_JIT_CACHE[key] = jax.jit(
            partial(poa_device_loop, cfg, interpret=interpret))
    return _LOOP_JIT_CACHE[key]


# ------------------------------------------------------------------ #
# host-side state init / eligibility

def init_state_np(graphs, cfg: LoopConfig):
    """Build the initial GState (numpy) + topo/remain arrays from host
    graphs that already contain read 0 (and are topo-sorted)."""
    B, R, E, P, A = cfg.B, cfg.R, cfg.E, cfg.P, cfg.A
    z = np.zeros
    bases = z((B, R), np.int32)
    out_ids = z((B, R, E), np.int32)
    out_w = z((B, R, E), np.int32)
    n_out = z((B, R), np.int32)
    in_ids = z((B, R, P), np.int32)
    n_in = z((B, R), np.int32)
    al_ids = z((B, R, A), np.int32)
    n_al = z((B, R), np.int32)
    node_n = z(B, np.int32)
    fail = z(B, np.int32)
    i2n = z((B, R), np.int32)
    n2i = z((B, R), np.int32)
    remain = z((B, R), np.int32)

    def fill(dst_ids, dst_n, flat, off, b, n, extra=None, dst_w=None):
        cnt = (off[1:] - off[:-1]).astype(np.int64)
        if cnt[:n].max(initial=0) > dst_ids.shape[2]:
            return False
        rows = np.repeat(np.arange(n), cnt[:n])
        pos = np.arange(len(rows)) - np.repeat(
            np.cumsum(cnt[:n]) - cnt[:n], cnt[:n])
        dst_ids[b, rows, pos] = flat[:len(rows)]
        dst_n[b, :n] = cnt[:n]
        if dst_w is not None:
            dst_w[b, rows, pos] = extra[:len(rows)]
        return True

    for b, g in enumerate(graphs):
        c = g.build_csr()
        n = c["n"]
        if n > R:
            fail[b] = 1
            node_n[b] = min(n, R)
            continue
        node_n[b] = n
        bases[b, :n] = c["bases"][:n]
        ok = fill(out_ids, n_out, c["out_flat"], c["out_off"], b, n,
                  extra=c["out_w_flat"], dst_w=out_w)
        ok &= fill(in_ids, n_in, c["in_flat"], c["in_off"], b, n)
        ok &= fill(al_ids, n_al, c["al_flat"], c["al_off"], b, n)
        if not ok:
            fail[b] = 1
            continue
        i2n[b, :n] = np.asarray(g.index_to_node_id[:n])
        n2i[b, :n] = np.asarray(g.node_id_to_index[:n])
        remain[b, :n] = np.asarray(g.node_id_to_max_remain[:n])
    stt = GState(bases, out_ids, out_w, n_out, in_ids, n_in, al_ids,
                 n_al, node_n, fail)
    return stt, i2n, n2i, remain


def make_scal_base(params, cfg: LoopConfig):
    """Static scal template (gaps/zdrop/matrix/inf_min); per-instance
    slots are overwritten on device (build_dp_inputs)."""
    from . import dp_pallas as dpp
    m = params.m
    scal = np.zeros(dpp.S_NSCAL + m * m, dtype=np.int32)
    scal[dpp.S_INF] = cfg.inf_min
    scal[dpp.S_E1] = params.gap_ext1
    scal[dpp.S_O1] = params.gap_open1
    scal[dpp.S_OE1] = params.gap_oe1
    scal[dpp.S_E2] = params.gap_ext2
    scal[dpp.S_O2] = params.gap_open2
    scal[dpp.S_OE2] = params.gap_oe2
    scal[dpp.S_ZDROP] = params.zdrop
    scal[dpp.S_NSCAL:] = np.asarray(params.mat, dtype=np.int64).reshape(-1)
    return scal


# ------------------------------------------------------------------ #
# merged graph kernel: scalar-SMEM fusion replay + Kahn toposort +
# max_remain in ONE Pallas program. The XLA fuse_batch is semantically
# identical but its scatters serialize on TPU (~77 ms/round at B=64,
# the round-4 phase ablation); the scalar replay is a direct
# transcription of the C semantics (native/poagraph.c pg_fuse_steps;
# ref src/abpoa_graph.c:596-672) at ~ns/op in SMEM. State crosses the
# rounds as packed 16-bit halves (PackedState) and is mutated in place.
#
# State-residency impls (GK_IMPL / the `impl` arg):
#   "scalar": state as SMEM in+out blocks, scalar copy-in loop (the
#             round-4 shape; always works, GT<=4 SMEM budget)
#   "smem":   state as SMEM in+out blocks, DMA copy-in (kills the ~13*R
#             scalar ops/program of the copy loop)
#   "any":    state stays in HBM (pl.ANY, aliased in==out), DMA'd into
#             SMEM scratch and back per program — halves the SMEM
#             footprint (no input/output double residency) so GT=8 fits

GK_IMPL = "smem"

# phase ablation for performance attribution (bench/probes only): set
# via LoopConfig.abl (the ABPOA_GK_ABLATE env through the dispatcher) so
# the jit caches key it — "graph" skips the whole graph kernel in
# device_round_packed; "fuse"/"topo"/"remain" skip that pass inside the
# kernel (outputs are then wrong; timings isolate the remaining phases).


def _ablated(cfg, phase: str) -> bool:
    return phase in getattr(cfg, "abl", "").split(",")


def make_graph_kernel2(cfg: LoopConfig, impl: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, E, P, A, G, LS = cfg.R, cfg.E, cfg.P, cfg.A, cfg.GT, cfg.LS
    E2, P2, A2 = E // 2, P // 2, (A + 1) // 2
    WB_ = cfg.wbits
    IDB = 16 - WB_
    IDM = (1 << IDB) - 1
    WONE = 1 << IDB        # +1 to the packed weight
    # ctrl word: base(3) | n_out(4)<<3 | n_al(3)<<7 | n_in(4)<<10
    #            | max_remain(16, signed)<<16
    # out halves: id(IDB) | weight(WB_)<<IDB — R <= 2^IDB and per-edge
    # weight < 2^WB_ are eligibility guards in the dispatcher
    (FS_T, FS_LAST, FS_LNEW, FS_NN, FS_FAIL, FS_LIVE, FS_DONE,
     FS_QID, FS_TMP, FS_ROW) = range(10)
    (SV_HEAD, SV_TAIL, SV_IDX, SV_DONE) = range(4)
    GV = cfg.gv
    WM = cfg.wmode

    def body(msc, i2n_in, steps, qp4, qw, ctrl, outp, inp, alp,
             i2nn_o, stat_o, indeg, q, fsv, stv):
        # in-degree scratch seeds from the PRE-fusion counts; fusion's
        # in-append sites bump it incrementally
        def seed(t, c):
            for g in range(G):
                indeg[g, t] = (ctrl[0, g, t] >> 10) & 15
            return c
        jax.lax.fori_loop(0, R, seed, 0)

        def half_get(ref, g, base_w, k):
            w = ref[0, g, base_w + (k >> 1)]
            return (w >> (16 * (k & 1))) & 0xFFFF

        # -- scalar helpers operating on the packed state (per g) --
        def ctrl_at(g, v):
            return ctrl[0, g, v]

        def out_at(g, u, e):
            if WM:
                return outp[0, g, u * E + e] & 0xFFFF
            w = outp[0, g, u * E2 + (e >> 1)]
            return (w >> (16 * (e & 1))) & IDM

        def qw_at(g, qi):
            return (qw[0, g, qi >> 1] >> (16 * (qi & 1))) & 0xFFFF

        def al_at(g, u, a):
            w = alp[0, g, u * A2 + (a >> 1)]
            return (w >> (16 * (a & 1))) & 0xFFFF

        def half_set(ref, g, word_i, k, val):
            w = ref[0, g, word_i]
            sh = 16 * (k & 1)
            ref[0, g, word_i] = (w & ~(0xFFFF << sh)) \
                | ((val & 0xFFFF) << sh)

        def al_append(g, x, val):
            """push val onto x's aligned list (cap-checked by caller)."""
            cm = ctrl[0, g, x]
            na = (cm >> 7) & 7
            half_set(alp, g, x * A2 + (na >> 1), na, val)
            ctrl[0, g, x] = cm + (1 << 7)

        def out_bump(g, u, e, wv):
            # += wv to the edge weight (wv is 1 in unit mode)
            if WM:
                i = u * E + e
                outp[0, g, i] = outp[0, g, i] + (wv << 16)
            else:
                half_set(outp, g, u * E2 + (e >> 1), e,
                         half_get(outp, g, u * E2, e) + WONE)

        def out_new(g, u, e, to, wv):
            if WM:
                outp[0, g, u * E + e] = to | (wv << 16)
            else:
                half_set(outp, g, u * E2 + (e >> 1), e, to | WONE)

        def fuse_step(g):
            t = fsv[g, FS_T]
            ej = msc[0, g, 1]
            nst = msc[0, g, 3]
            in_lead = t < ej
            in_tail = t >= ej + nst
            k = jnp.clip(nst - 1 - (t - ej), 0, LS - 1)
            # the stream is the WIRE-format steps16 halves, 2/word:
            # op(2) | dj(1)<<2 | di(13)<<3. The replay runs k DESCENDING
            # (forward query order), so the row reconstructs from the
            # last-pushed anchor (msc lasti) by ADDING di per consumed
            # entry: row(k-1) = row(k) + di(k).
            enc = (steps[0, g, k >> 1] >> (16 * (k & 1))) & 0xFFFF
            op = jnp.where(in_lead | in_tail, 1, enc & 3)
            fsv[g, FS_T] = t + 1
            row = fsv[g, FS_ROW]

            @pl.when(jnp.logical_not(in_lead | in_tail))
            def _():
                fsv[g, FS_ROW] = row + (enc >> 3)

            @pl.when(op != 2)          # DEL consumes nothing
            def _():
                # query position: incremental counter, exactly the C
                # query_id (col is not shipped; M/I consume one base)
                qid = fsv[g, FS_QID] + 1
                fsv[g, FS_QID] = qid
                qb = (qp4[0, g, (qid + 1) >> 2]
                      >> (8 * ((qid + 1) & 3))) & 0xFF
                is_m = op == 0
                nid = jnp.minimum(
                    i2n_in[0, g, jnp.clip(row, 0, R - 1)] & 0xFFFF,
                    R - 1)
                cw = ctrl[0, g, nid]
                gb = cw & 7
                na = (cw >> 7) & 7
                m_match = is_m & (gb == qb)
                # aligned-node search ONLY on a mismatch with a nonempty
                # list (ref searches on mismatch only): ~90% of steps are
                # base matches and skip the whole block — the branch
                # costs ~2 scalar ops vs A SMEM reads + compare chains
                fsv[g, FS_TMP] = -1

                @pl.when(is_m & jnp.logical_not(m_match) & (na > 0))
                def _():
                    if GV == 1:
                        for a in range(A):
                            @pl.when(a < na)
                            def _(a=a):
                                av = al_at(g, nid, a)

                                @pl.when((fsv[g, FS_TMP] < 0)
                                         & ((ctrl[0, g, av] & 7) == qb))
                                def _(av=av):
                                    fsv[g, FS_TMP] = av
                    else:
                        # branchless chain: the A loads issue
                        # back-to-back and pipeline
                        aid_ = jnp.int32(-1)
                        for a in range(A):
                            av = al_at(g, nid, a)
                            hit = (a < na) & ((ctrl[0, g, av] & 7) == qb)
                            aid_ = jnp.where((aid_ < 0) & hit, av, aid_)
                        fsv[g, FS_TMP] = aid_
                aid = fsv[g, FS_TMP]
                m_aid = is_m & jnp.logical_not(m_match) & (aid >= 0)
                is_new = jnp.logical_not(m_match | m_aid)
                nn_cur = fsv[g, FS_NN]
                to = jnp.where(m_match, nid,
                               jnp.where(m_aid, aid, nn_cur))
                fail_cap = is_new & (nn_cur >= R)
                fsv[g, FS_FAIL] = fsv[g, FS_FAIL] \
                    | fail_cap.astype(jnp.int32)
                # memory safety on the sticky-fail path: the edge block
                # below still reads/writes at `to`; dump it onto the last
                # in-bounds row of this instance's own block (the
                # instance is dead, the host rebuilds it on the oracle)
                to = jnp.where(fail_cap, jnp.int32(R - 1), to)

                @pl.when(is_new & jnp.logical_not(fail_cap))
                def _():
                    ctrl[0, g, nn_cur] = qb
                    indeg[g, nn_cur] = 0
                    fsv[g, FS_NN] = nn_cur + 1

                    # aligned bundling for mismatch-created nodes
                    # (all-pairs, ref src/abpoa_graph.c:377-401)
                    @pl.when(is_m)
                    def _():
                        ov = (na + 1 > A).astype(jnp.int32)
                        fsv[g, FS_FAIL] = fsv[g, FS_FAIL] | ov

                        @pl.when(ov == 0)
                        def _():
                            for a in range(A):
                                @pl.when(a < na)
                                def _(a=a):
                                    m = al_at(g, nid, a)
                                    al_append(g, m, to)
                                    al_append(g, to, m)
                            al_append(g, nid, to)
                            al_append(g, to, nid)

                # edge last -> to, unit weight; skipped when the
                # from-node is new (no edges can exist yet)
                last = fsv[g, FS_LAST]
                lnew = fsv[g, FS_LNEW] > 0
                lcw = ctrl[0, g, last]
                no = (lcw >> 3) & 15
                fsv[g, FS_TMP] = -1

                @pl.when(jnp.logical_not(lnew))
                def _():
                    if GV == 1:
                        for e in range(E):
                            @pl.when(e < no)
                            def _(e=e):
                                @pl.when((fsv[g, FS_TMP] < 0)
                                         & (out_at(g, last, e) == to))
                                def _():
                                    fsv[g, FS_TMP] = e
                    elif GV == 2:
                        # slot-0 probe: backbone edges were appended
                        # first, so a re-traversal hits slot 0 almost
                        # always — one load + one branch on that path
                        hit0 = (no > 0) & (out_at(g, last, 0) == to)
                        fsv[g, FS_TMP] = jnp.where(hit0, 0, -1)

                        @pl.when(jnp.logical_not(hit0) & (no > 1))
                        def _():
                            s_ = jnp.int32(-1)
                            for e in range(1, E):
                                sm = (e < no) & (out_at(g, last, e) == to)
                                s_ = jnp.where((s_ < 0) & sm, e, s_)
                            fsv[g, FS_TMP] = s_
                    else:
                        s_ = jnp.int32(-1)
                        for e in range(E):
                            sm = (e < no) & (out_at(g, last, e) == to)
                            s_ = jnp.where((s_ < 0) & sm, e, s_)
                        fsv[g, FS_TMP] = s_
                slot = fsv[g, FS_TMP]

                wv = qw_at(g, qid) if WM else 1

                @pl.when(slot >= 0)
                def _():
                    out_bump(g, last, slot, wv)

                @pl.when(slot < 0)
                def _():
                    tcw = ctrl[0, g, to]
                    ni = (tcw >> 10) & 15
                    ov = ((no >= E) | (ni >= P)).astype(jnp.int32)
                    fsv[g, FS_FAIL] = fsv[g, FS_FAIL] | ov

                    @pl.when(ov == 0)
                    def _():
                        out_new(g, last, no, to, wv)
                        ctrl[0, g, last] = lcw + (1 << 3)
                        half_set(inp, g, to * P2 + (ni >> 1), ni, last)
                        ctrl[0, g, to] = ctrl[0, g, to] + (1 << 10)
                        indeg[g, to] = indeg[g, to] + 1
                fsv[g, FS_LAST] = to
                fsv[g, FS_LNEW] = is_new.astype(jnp.int32)

        # ---------------- init per-g fusion state ----------------
        for g in range(G):
            qlen = msc[0, g, 0]
            ej = msc[0, g, 1]
            bj = msc[0, g, 2]
            nst = msc[0, g, 3]
            bad = msc[0, g, 4]
            nn0 = msc[0, g, 5]
            fail_in = msc[0, g, 6]
            live_n = ej + nst + jnp.maximum(qlen - bj, 0)
            skip = (bad > 0) | (fail_in > 0) | (qlen == 0) | (live_n == 0)
            fsv[g, FS_T] = 0
            fsv[g, FS_LAST] = SRC_NODE_ID
            fsv[g, FS_LNEW] = 0
            fsv[g, FS_NN] = nn0
            fsv[g, FS_FAIL] = 0
            fsv[g, FS_LIVE] = jnp.where(skip, 0, live_n)
            fsv[g, FS_DONE] = skip.astype(jnp.int32)
            fsv[g, FS_QID] = -1
            fsv[g, FS_ROW] = msc[0, g, 7]   # lasti delta anchor

        FU = 4 if GV >= 3 else 2   # fuse steps per while iteration

        def fuse_body(alive):
            for _ in range(FU):
                for g in range(G):
                    @pl.when((fsv[g, FS_DONE] == 0)
                             & (fsv[g, FS_T] < fsv[g, FS_LIVE])
                             & (fsv[g, FS_FAIL] == 0))
                    def _(g=g):
                        fuse_step(g)
            na = jnp.int32(0)
            for g in range(G):
                done = (fsv[g, FS_DONE] > 0) \
                    | (fsv[g, FS_T] >= fsv[g, FS_LIVE]) \
                    | (fsv[g, FS_FAIL] > 0)
                na += jnp.where(done, 0, 1)
            return na

        if not _ablated(cfg, "fuse"):
            jax.lax.while_loop(lambda a: a > 0, fuse_body, jnp.int32(G))

        # final edge last -> SINK (ref pg_fuse_steps tail)
        for g in range(G):
            @pl.when((fsv[g, FS_DONE] == 0) & (fsv[g, FS_FAIL] == 0))
            def _(g=g):
                last = fsv[g, FS_LAST]
                lnew = fsv[g, FS_LNEW] > 0
                lcw = ctrl[0, g, last]
                no = (lcw >> 3) & 15
                to = jnp.int32(SINK_NODE_ID)
                slot = jnp.int32(-1)
                for e in range(E):
                    sm = (e < no) & (out_at(g, last, e) == to) \
                        & jnp.logical_not(lnew)
                    slot = jnp.where((slot < 0) & sm, e, slot)

                wvs = qw_at(g, msc[0, g, 0] - 1) if WM else 1

                @pl.when(slot >= 0)
                def _():
                    out_bump(g, last, slot, wvs)

                @pl.when(slot < 0)
                def _():
                    tcw = ctrl[0, g, to]
                    ni = (tcw >> 10) & 15
                    ov = ((no >= E) | (ni >= P)).astype(jnp.int32)
                    fsv[g, FS_FAIL] = fsv[g, FS_FAIL] | ov

                    @pl.when(ov == 0)
                    def _():
                        out_new(g, last, no, to, wvs)
                        ctrl[0, g, last] = lcw + (1 << 3)
                        half_set(inp, g, to * P2 + (ni >> 1), ni, last)
                        ctrl[0, g, to] = ctrl[0, g, to] + (1 << 10)
                        indeg[g, to] = indeg[g, to] + 1

        # ---------------- Kahn FIFO toposort (post-fusion state) ------
        # indeg scratch was seeded in cp_in and maintained by the
        # fusion's append sites — no rebuild pass
        for g in range(G):
            q[g, 0] = SRC_NODE_ID
            stv[g, SV_HEAD] = 0
            stv[g, SV_TAIL] = 1
            stv[g, SV_IDX] = 0
            stv[g, SV_DONE] = 0

        def pop(g):
            head = stv[g, SV_HEAD]
            idx = stv[g, SV_IDX]
            cur = q[g, head]
            # both topo maps live in ONE packed word array: low half
            # i2n[idx], high half n2i[id] — every live slot gets both
            # halves written over the course of the sort
            w = i2nn_o[0, g, idx]
            i2nn_o[0, g, idx] = (w & ~0xFFFF) | cur
            w2 = i2nn_o[0, g, cur]
            i2nn_o[0, g, cur] = (w2 & 0xFFFF) | (idx << 16)
            stv[g, SV_HEAD] = head + 1
            stv[g, SV_IDX] = idx + 1
            stv[g, SV_DONE] = jnp.where(cur == SINK_NODE_ID, 1, 0)

            @pl.when(cur != SINK_NODE_ID)
            def _():
                no = (ctrl[0, g, cur] >> 3) & 15
                for e in range(E):
                    @pl.when(e < no)
                    def _(e=e):
                        v = out_at(g, cur, e)
                        d = indeg[g, v] - 1
                        indeg[g, v] = d

                        @pl.when(d == 0)
                        def _(v=v):
                            na_v = (ctrl[0, g, v] >> 7) & 7
                            rdy = jnp.int32(1)
                            for a in range(A):
                                av = al_at(g, v, a)
                                rdy = rdy & jnp.where(
                                    a >= na_v, 1,
                                    (indeg[g, av] == 0)
                                    .astype(jnp.int32))

                            @pl.when(rdy > 0)
                            def _(v=v, na_v=na_v):
                                t0 = stv[g, SV_TAIL]
                                q[g, t0] = v
                                for a in range(A):
                                    @pl.when(a < na_v)
                                    def _(a=a):
                                        q[g, t0 + 1 + a] = al_at(g, v, a)
                                stv[g, SV_TAIL] = t0 + 1 + na_v

        KP = 8 if GV >= 3 else 4   # pops per while iteration

        def topo_body(alive):
            for _ in range(KP):
                for g in range(G):
                    @pl.when((stv[g, SV_DONE] == 0)
                             & (stv[g, SV_HEAD] < stv[g, SV_TAIL]))
                    def _(g=g):
                        pop(g)
            na = jnp.int32(0)
            for g in range(G):
                na += jnp.where((stv[g, SV_DONE] == 0)
                                & (stv[g, SV_HEAD] < stv[g, SV_TAIL]),
                                1, 0)
            return na

        if not _ablated(cfg, "topo"):
            jax.lax.while_loop(lambda a: a > 0, topo_body, jnp.int32(G))

        # ------- max_remain in reverse topo order (packed into the ----
        # ctrl word's upper half so the DP kernel reads base/degrees/
        # remain in ONE SMEM word). Values of ref src/abpoa_graph.c:
        # 233-274 with remain_batch's first-max tie-break (max weight,
        # lowest slot); remain[SINK] = -1 (ref :244). Reverse topo order
        # guarantees the heaviest successor's remain is already final.
        # Runs for skipped instances too (same state -> same values) and
        # over garbage state on failed instances (clamped reads; the
        # instance is dead either way).
        def rem_body(k, c):
            for g in range(G):
                nn = fsv[g, FS_NN]

                @pl.when(k < nn)
                def _(g=g, nn=nn):
                    u = jnp.clip(i2nn_o[0, g, nn - 1 - k] & 0xFFFF,
                                 0, R - 1)
                    cw = ctrl[0, g, u]
                    no = (cw >> 3) & 15

                    def edge_iw(e, u=u):
                        """(id, weight) of out slot e."""
                        if WM:
                            word = outp[0, g, u * E + e]
                            return word & 0xFFFF, word >> 16
                        hw = outp[0, g, u * E2 + (e >> 1)]
                        hv = (hw >> (16 * (e & 1))) & 0xFFFF
                        return hv & IDM, hv >> IDB

                    if GV == 0:
                        bw_ = jnp.int32(-1)
                        bv_ = jnp.int32(SINK_NODE_ID)
                        for e in range(E):
                            eid, ew = edge_iw(e)
                            take = (e < no) & (ew > bw_)
                            bv_ = jnp.where(take, eid, bv_)
                            bw_ = jnp.where(take, ew, bw_)
                        bv = bv_
                    else:
                        # single-out fast path (chain nodes, the vast
                        # majority): the heaviest edge IS slot 0; the
                        # first-max scan runs only for out-degree > 1
                        id0, w0 = edge_iw(0)
                        fsv[g, FS_TMP] = id0

                        @pl.when(no > 1)
                        def _(u=u, id0=id0, w0=w0):
                            bw = w0
                            bv2 = id0
                            for e in range(1, E):
                                eid, ew = edge_iw(e, u)
                                take = (e < no) & (ew > bw)
                                bv2 = jnp.where(take, eid, bv2)
                                bw = jnp.where(take, ew, bw)
                            fsv[g, FS_TMP] = bv2
                        bv = jnp.where(no == 0, jnp.int32(SINK_NODE_ID),
                                       fsv[g, FS_TMP])
                    rem = jnp.where(
                        u == SINK_NODE_ID, jnp.int32(-1),
                        (ctrl[0, g, jnp.minimum(bv, R - 1)] >> 16) + 1)
                    ctrl[0, g, u] = (cw & 0xFFFF) | (rem << 16)
            return c
        if not _ablated(cfg, "remain"):
            jax.lax.fori_loop(0, R, rem_body, 0)

        for g in range(G):
            fail = fsv[g, FS_FAIL] | msc[0, g, 6] \
                | (msc[0, g, 4] & (msc[0, g, 0] > 0).astype(jnp.int32))
            nn = fsv[g, FS_NN]
            topo_ok = (stv[g, SV_DONE] > 0) & (stv[g, SV_IDX] == nn)
            fail = fail | ((fsv[g, FS_DONE] == 0)
                           & jnp.logical_not(topo_ok)).astype(jnp.int32)
            stat_o[0, g, 0] = nn
            stat_o[0, g, 1] = fail

    NSI = 5 if WM else 4   # non-state inputs (msc,i2n,steps,qp4[,qw])
    OE = E if WM else E2   # outp words per node

    def _split_ins(refs):
        msc, i2n_in, steps, qp4 = refs[:4]
        qw = refs[4] if WM else None
        return msc, i2n_in, steps, qp4, qw

    if impl == "any":
        def kernel(*refs):
            msc, i2n_in, steps, qp4, qw = _split_ins(refs)
            (ctrl_h, outp_h, inp_h, alp_h) = refs[NSI:NSI + 4]
            (ctrl_ho, outp_ho, inp_ho, alp_ho) = refs[NSI + 4:NSI + 8]
            (i2nn_o, stat_o) = refs[NSI + 8:NSI + 10]
            (ctrl, outp, inp, alp, indeg, q, fsv, stv,
             sems) = refs[NSI + 10:]
            # state lives in HBM (aliased in==out); DMA the program's
            # slice into SMEM scratch, mutate, DMA back
            b = pl.program_id(0)
            ins = ((ctrl_h, ctrl), (outp_h, outp), (inp_h, inp),
                   (alp_h, alp))
            dmas = [pltpu.make_async_copy(src.at[b], dst.at[0],
                                          sems.at[i])
                    for i, (src, dst) in enumerate(ins)]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
            body(msc, i2n_in, steps, qp4, qw, ctrl, outp, inp, alp,
                 i2nn_o, stat_o, indeg, q, fsv, stv)
            outs = ((ctrl, ctrl_ho), (outp, outp_ho), (inp, inp_ho),
                    (alp, alp_ho))
            dmas = [pltpu.make_async_copy(src.at[0], dst.at[b],
                                          sems.at[i])
                    for i, (src, dst) in enumerate(outs)]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
    elif impl == "smem":
        def kernel(*refs):
            msc, i2n_in, steps, qp4, qw = _split_ins(refs)
            (ctrl_i, outp_i, inp_i, alp_i) = refs[NSI:NSI + 4]
            (ctrl, outp, inp, alp) = refs[NSI + 4:NSI + 8]
            (i2nn_o, stat_o) = refs[NSI + 8:NSI + 10]
            (indeg, q, fsv, stv, sems) = refs[NSI + 10:]
            # Output SMEM blocks are NOT initialized from the aliased
            # HBM buffers on the compiled backend (aliasing only donates
            # HBM); DMA the input blocks across instead of the round-4
            # scalar copy loop (~13*R scalar ops/program)
            ins = ((ctrl_i, ctrl), (outp_i, outp), (inp_i, inp),
                   (alp_i, alp))
            dmas = [pltpu.make_async_copy(src, dst, sems.at[i])
                    for i, (src, dst) in enumerate(ins)]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
            body(msc, i2n_in, steps, qp4, qw, ctrl, outp, inp, alp,
                 i2nn_o, stat_o, indeg, q, fsv, stv)
    else:  # "scalar"
        def kernel(*refs):
            msc, i2n_in, steps, qp4, qw = _split_ins(refs)
            (ctrl_i, outp_i, inp_i, alp_i) = refs[NSI:NSI + 4]
            (ctrl, outp, inp, alp) = refs[NSI + 4:NSI + 8]
            (i2nn_o, stat_o) = refs[NSI + 8:NSI + 10]
            (indeg, q, fsv, stv) = refs[NSI + 10:]

            def cp_in(t, c):
                for g in range(G):
                    ctrl[0, g, t] = ctrl_i[0, g, t]
                    for e in range(OE):
                        outp[0, g, t * OE + e] = outp_i[0, g, t * OE + e]
                    for pp in range(P2):
                        inp[0, g, t * P2 + pp] = inp_i[0, g, t * P2 + pp]
                    for a in range(A2):
                        alp[0, g, t * A2 + a] = alp_i[0, g, t * A2 + a]
                return c
            jax.lax.fori_loop(0, R, cp_in, 0)
            body(msc, i2n_in, steps, qp4, qw, ctrl, outp, inp, alp,
                 i2nn_o, stat_o, indeg, q, fsv, stv)
    return kernel


class PackedState(NamedTuple):
    """The device loop's scan carry: the graph state in the packed form
    both kernels consume directly — no per-round pack/unpack/gather glue.
    ctrl: base(3)|n_out(4)<<3|n_al(3)<<7|n_in(4)<<10|remain(16,s)<<16;
    outp: out-edge halves id|w<<(16-wbits); inp/alp: id halves;
    i2nn: the topo maps packed as i2n | n2i<<16."""
    ctrl: "jax.Array"     # [B, R] i32
    outp: "jax.Array"     # [B, R*E//2] i32
    inp: "jax.Array"      # [B, R*P//2] i32
    alp: "jax.Array"      # [B, R*(A+1)//2] i32
    i2nn: "jax.Array"     # [B, R] i32
    node_n: "jax.Array"   # [B] i32
    fail: "jax.Array"     # [B] i32 (sticky)


def _pack2(x, B, R, k2):
    import jax.numpy as jnp
    i32 = jnp.int32
    x = x.astype(i32) & 0xFFFF
    if x.shape[2] % 2:
        x = jnp.concatenate([x, jnp.zeros((B, R, 1), i32)], axis=2)
    return (x[:, :, 0::2] | (x[:, :, 1::2] << 16)).reshape(B, R * k2)


def _unpack2(x, B, R, k, cap):
    import jax.numpy as jnp
    x = x.reshape(B, R, k)
    lo = x & 0xFFFF
    hi = (x >> 16) & 0xFFFF
    full = jnp.stack([lo, hi], axis=3).reshape(B, R, 2 * k)
    return full[:, :, :cap]


def pack_state(cfg: LoopConfig, st: GState, i2n, n2i, remain):
    """GState (+ topo/remain arrays, node-id indexed) -> PackedState."""
    import jax.numpy as jnp
    i32 = jnp.int32
    B, R = st.bases.shape[0], cfg.R
    E2, P2, A2 = cfg.E // 2, cfg.P // 2, (cfg.A + 1) // 2
    IDB = 16 - cfg.wbits
    st = GState(*(jnp.asarray(x) for x in st))
    ctrl = (st.bases.astype(i32) | (st.n_out.astype(i32) << 3)
            | (st.n_al.astype(i32) << 7) | (st.n_in.astype(i32) << 10)
            | ((jnp.asarray(remain).astype(i32) & 0xFFFF) << 16))
    if cfg.wmode:
        # qv weights: full words id | w<<16
        outp = (st.out_ids.astype(i32)
                | (st.out_w.astype(i32) << 16)).reshape(B, R * cfg.E)
    else:
        outp = _pack2(st.out_ids.astype(i32)
                      | (st.out_w.astype(i32) << IDB), B, R, E2)
    inp = _pack2(st.in_ids, B, R, P2)
    alp = _pack2(st.al_ids, B, R, A2)
    i2nn = (jnp.asarray(i2n).astype(i32) & 0xFFFF) \
        | (jnp.asarray(n2i).astype(i32) << 16)
    return PackedState(ctrl, outp, inp, alp, i2nn, st.node_n, st.fail)


def unpack_state(cfg: LoopConfig, ps: PackedState):
    """PackedState -> (GState, i2n, n2i, remain) for tests/fallbacks."""
    B, R = ps.ctrl.shape[0], cfg.R
    E, P, A = cfg.E, cfg.P, cfg.A
    E2, P2, A2 = E // 2, P // 2, (A + 1) // 2
    IDB = 16 - cfg.wbits
    ctrl = ps.ctrl
    if cfg.wmode:
        ow_full = ps.outp.reshape(B, R, E)
        out_ids, out_w = ow_full & 0xFFFF, ow_full >> 16
    else:
        ow = _unpack2(ps.outp, B, R, E2, E)
        out_ids, out_w = ow & ((1 << IDB) - 1), ow >> IDB
    st = GState(
        bases=ctrl & 7,
        out_ids=out_ids, out_w=out_w,
        n_out=(ctrl >> 3) & 15,
        in_ids=_unpack2(ps.inp, B, R, P2, P), n_in=(ctrl >> 10) & 15,
        al_ids=_unpack2(ps.alp, B, R, A2, A), n_al=(ctrl >> 7) & 7,
        node_n=ps.node_n, fail=ps.fail)
    return st, ps.i2nn & 0xFFFF, ps.i2nn >> 16, ctrl >> 16


def s16w_to_s16(s16w):
    """Wire words (2 steps16 halves/int32, low = even step) -> the flat
    int16 stream tests and the host replay consume."""
    import jax
    import jax.numpy as jnp
    h = jax.lax.bitcast_convert_type(s16w, jnp.int16)
    return h.reshape(*s16w.shape[:-1], -1)


def steps32_to_s16w(steps, misc):
    """Legacy op|row<<2|col<<14 step words + misc -> (wire s16w halves,
    misc with M_LASTI set). Compat shim for tests that hand-build step
    streams (the production DP kernel emits the wire format directly)."""
    import jax.numpy as jnp
    from . import dp_pallas as dpp
    from .dp_pallas_band import steps16_compress
    i32 = jnp.int32
    s16 = steps16_compress(steps, misc).astype(i32) & 0xFFFF
    s16w = s16[..., 0::2] | (s16[..., 1::2] << 16)
    iseq = (steps >> 2) & 0xFFF
    lasti = jnp.take_along_axis(
        iseq, jnp.maximum(misc[:, dpp.M_NSTEPS:dpp.M_NSTEPS + 1] - 1, 0),
        axis=1)[:, 0]
    return s16w, misc.at[:, dpp.M_LASTI].set(lasti)


def pack_qp4(cfg: LoopConfig, qcodes):
    """Query codes -> 4 bases/word for the graph kernel's SMEM reads.
    Leading axes free (the loop precomputes all rounds before the scan)."""
    import jax.numpy as jnp
    i32 = jnp.int32
    qb = qcodes.astype(i32) & 0xFF
    if cfg.Wq % 4:
        pad = qb.shape[:-1] + (4 - cfg.Wq % 4,)
        qb = jnp.concatenate([qb, jnp.zeros(pad, i32)], axis=-1)
    return (qb[..., 0::4] | (qb[..., 1::4] << 8) | (qb[..., 2::4] << 16)
            | (qb[..., 3::4] << 24))


def pack_qw(cfg: LoopConfig, qweights):
    """Per-base weight stream -> 16-bit halves, 2/word (wmode=1 only).
    qweights: [..., Wq] ints < 2^15; leading axes free."""
    import jax.numpy as jnp
    i32 = jnp.int32
    w = qweights.astype(i32) & 0xFFFF
    if cfg.Wq % 2:
        w = jnp.concatenate(
            [w, jnp.zeros(w.shape[:-1] + (1,), i32)], axis=-1)
    return w[..., 0::2] | (w[..., 1::2] << 16)


def graph_update_packed(cfg: LoopConfig, ps: PackedState, s16w, misc,
                        qlen, qp4, qw=None, interpret=False, impl=None):
    """Fusion + re-sort + max_remain of one round on the PACKED state via
    the merged Pallas graph kernel. Instances whose round was bad/failed
    (or qlen 0) keep their state; capacity or topo failure sets the
    sticky fail flag. s16w: [B, LS//2] wire-format steps16 halves (the
    DP kernel's direct output; rows reconstruct from misc M_LASTI);
    qp4: [B, ceil(Wq/4)] packed query codes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import dp_pallas as dpp
    B, R, E, P, A, G = ps.ctrl.shape[0], cfg.R, cfg.E, cfg.P, cfg.A, cfg.GT
    E2, P2, A2 = E // 2, P // 2, (A + 1) // 2
    NP_ = B // G
    i32 = jnp.int32
    impl = cfg.gk if impl is None else impl

    bad = (misc[:, dpp.M_OVFL] | misc[:, dpp.M_FAIL]) > 0
    msc = jnp.stack(
        [qlen, jnp.maximum(misc[:, dpp.M_ENDJ], 0), misc[:, dpp.M_BJ],
         misc[:, dpp.M_NSTEPS], bad.astype(i32), ps.node_n,
         ps.fail, misc[:, dpp.M_LASTI]], axis=1)

    def grp(x):
        return x.reshape(NP_, G, -1)

    def smem(k):
        return pl.BlockSpec((1, G, k), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)

    kern = make_graph_kernel2(cfg, impl)
    LS2 = s16w.shape[1]
    OE = E if cfg.wmode else E2
    state_k = (R, R * OE, R * P2, R * A2)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((NP_, G, k), i32) for k in state_k) + (
        jax.ShapeDtypeStruct((NP_, G, R), i32),        # i2n|n2i<<16
        jax.ShapeDtypeStruct((NP_, G, 2), i32),        # node_n, fail
    )
    in_specs = [smem(8), smem(R), smem(LS2), smem(Wq4_of(cfg))]
    ws_in = ()
    if cfg.wmode:
        assert qw is not None
        in_specs.append(smem(qw.shape[-1]))
        ws_in = (grp(qw),)
    NSI = len(in_specs)
    scratch = [pltpu.SMEM((G, R), i32),   # indeg
               pltpu.SMEM((G, R), i32),   # queue
               pltpu.SMEM((G, 12), i32),  # fusion state (+search temp)
               pltpu.SMEM((G, 4), i32)]   # topo state
    if impl == "any":
        anyspec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs += [anyspec] * 4
        out_specs = (anyspec,) * 4 + (smem(R), smem(2))
        # state scratch (the DMA targets) + 4 DMA semaphores
        scratch = [pltpu.SMEM((1, G, k), i32) for k in state_k] \
            + scratch + [pltpu.SemaphoreType.DMA((4,))]
    else:
        in_specs += [smem(k) for k in state_k]
        out_specs = tuple(smem(k) for k in state_k) \
            + (smem(R), smem(2))
        if impl == "smem":
            scratch = scratch + [pltpu.SemaphoreType.DMA((4,))]
    outs = pl.pallas_call(
        kern,
        grid=(NP_,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={NSI + i: i for i in range(4)},
        scratch_shapes=scratch,
        interpret=interpret,
    )(grp(msc), grp(ps.i2nn), grp(s16w), grp(qp4), *ws_in,
      grp(ps.ctrl), grp(ps.outp), grp(ps.inp), grp(ps.alp))
    (ctrl2, outp2, inp2, alp2, i2nn2, stat) = outs
    stat = stat.reshape(B, 2)
    return PackedState(ctrl2.reshape(B, R), outp2.reshape(B, R * OE),
                       inp2.reshape(B, R * P2), alp2.reshape(B, R * A2),
                       i2nn2.reshape(B, R),
                       stat[:, 0], stat[:, 1])


def Wq4_of(cfg: LoopConfig) -> int:
    return (cfg.Wq + 3) // 4


def graph_update_batch(cfg: LoopConfig, st: GState, i2n, steps, misc,
                       qcodes, qlen, interpret=False):
    """GState-API compatibility wrapper over graph_update_packed (tests
    cross-check it against fuse_batch + topo_batch). Takes the legacy
    op|row<<2|col<<14 step words; remain is recomputed in-kernel and
    dropped here."""
    import jax.numpy as jnp
    zeros = jnp.zeros_like(jnp.asarray(i2n))
    ps = pack_state(cfg, st, i2n, zeros, zeros)
    qp4 = pack_qp4(cfg, qcodes)
    s16w, misc2 = steps32_to_s16w(jnp.asarray(steps), jnp.asarray(misc))
    ps2 = graph_update_packed(cfg, ps, s16w, misc2, qlen, qp4,
                              interpret=interpret)
    st2, i2n2, n2i2, _ = unpack_state(cfg, ps2)
    return st2, i2n2, n2i2
