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

Scope (v1): global align mode, banded (wb >= 0), any gap mode, unit
weights, m == 5, no amb_strand / qv / incremental restore. Everything
else stays on the round-based host loop. Per-instance failures (band
overflow, walk dead end, capacity overflow) set a sticky flag; the host
re-runs those instances on the bit-exact oracle.
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
            return (w >> (16 * (e & 1))) & 0xFFFF

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

        def body(alive):
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
                    qcodes, qlen, scal_base, wb, wf1000):
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

def device_round(cfg: LoopConfig, st: GState, i2n, n2i, remain, qcodes,
                 qlen, scal_base, wb, wf1000, interpret=False):
    """One POA round entirely on device: DP+walk on the current planes,
    vectorized fusion, re-sort, remain, plane state for the next round.
    Returns (new carry..., per-round outputs (steps16, misc))."""
    import jax.numpy as jnp
    from .dp_pallas_band import BandConfig, band_poa_dp_batch
    B = cfg.B
    i8 = jnp.int8
    i16 = jnp.int16
    scal, bases_row, pre_idx, pre_nn, remain_row = build_dp_inputs(
        cfg, st, i2n, n2i, remain, qcodes, qlen, scal_base, wb, wf1000)
    bc = BandConfig(gap_mode=cfg.gap_mode, align_mode=GLOBAL_MODE,
                    pn=cfg.pn, R=cfg.R, WB=cfg.WB, Wq=cfg.Wq, P=cfg.P,
                    O=2, m=5, use_zdrop=cfg.use_zdrop, bt_lmax=cfg.LS,
                    G=cfg.G, fresh=True)
    dummy = jnp.zeros((B, 1), i8)
    out = band_poa_dp_batch(
        bc, scal, bases_row.astype(i8),
        pre_idx.reshape(B, cfg.R * cfg.P).astype(i16),
        pre_nn.astype(i8), dummy, dummy, remain_row.astype(i16),
        qcodes.astype(i8), dummy, dummy, dummy, interpret=interpret)
    st2 = fuse_batch(cfg, st, i2n, out.steps, out.misc, qcodes, qlen)
    i2n2, n2i2, ok = topo_batch(cfg, st2, interpret=interpret)
    fail = st2.fail | ((ok == 0) & (qlen > 0)).astype(jnp.int32)
    st2 = st2._replace(fail=fail)
    remain2 = remain_batch(cfg, st2)
    return st2, i2n2, n2i2, remain2, out.misc, out.steps16


def poa_device_loop(cfg: LoopConfig, st0: GState, i2n0, n2i0, remain0,
                    qcodes_rounds, qlen_rounds, scal_base, wb, wf1000,
                    interpret=False):
    """lax.scan over NR rounds; ONE dispatch. Returns
    (final GState, misc [NR, B, M_NMISC], steps16 [NR, B, LS])."""
    import jax
    import jax.numpy as jnp

    def body(carry, xs):
        st, i2n, n2i, remain = carry
        qc, ql = xs
        st2, i2n2, n2i2, remain2, misc, s16 = device_round(
            cfg, st, i2n, n2i, remain, qc, ql, scal_base, wb, wf1000,
            interpret=interpret)
        return (st2, i2n2, n2i2, remain2), (misc, s16)

    (stF, _, _, _), (misc, s16) = jax.lax.scan(
        body, (st0, i2n0, n2i0, remain0),
        (qcodes_rounds, qlen_rounds))
    return stF, misc, s16


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
