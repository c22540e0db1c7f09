"""Pallas TPU kernel v3: full-width masked POA DP, G instances per program.

Design rationale (vs the banded-tile kernel in dp_pallas.py):

  * Plane rows live at ABSOLUTE query columns ([R, Wq] per instance), so
    predecessor-row merges are static shifts (roll by 1) instead of
    per-predecessor dynamic rolls through a pad buffer — the dominant cost
    of the banded kernel. The adaptive band still governs which cells are
    *semantically* computed, via the same fill/merge masks as ops/dp_xla.py
    (this file is a mechanical port of that row body, which is proven
    cell-exact against the bit-exact oracle); out-of-band cells hold 0 and
    the guard segment holds inf_min, exactly like the XLA engine's planes.
  * G instances are packed into the sublane dimension: all vector work runs
    on (G, Wq) tiles, filling the 8x128 VPU instead of wasting 7/8 sublanes
    on (1, W) rows. Instances advance row-lockstep (row t of all G at once;
    per-instance activity masked), which is exact because instances are
    independent.
  * The backtrack runs in-kernel per instance over the full-width planes
    (absolute columns — no offset bookkeeping), emitting the same packed
    step stream as dp_pallas.py.
  * Full width means the band can never overflow a static tile: no
    overflow fallback path.

VMEM: 5 planes x G x R x Wq x 4B; the host picks G so this fits (~100MB).
Supported: global/extend x linear/affine/convex, banded. Local/unbanded
fall back to dp_xla as before.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import (GLOBAL_MODE, LOCAL_MODE, EXTEND_MODE, LINEAR_GAP,
                      CONVEX_GAP)
from .dp_pallas import (S_QLEN, S_NROWS, S_W, S_INF, S_REMEND, S_E1, S_O1,
                        S_OE1, S_E2, S_O2, S_OE2, S_ZDROP, S_DPSN, S_NSCAL,
                        M_BEST, M_BI, M_BJ, M_CELLS, M_OVFL, M_NSTEPS,
                        M_FAIL, M_ENDI, M_ENDJ, M_NMISC,
                        BT_M, BT_E1, BT_E2, BT_F1, BT_F2, BT_E, BT_F,
                        BT_ALL)

NEG = -(1 << 29)


class FWOut(NamedTuple):
    beg_sn: jax.Array  # [B, R]
    end_sn: jax.Array
    mpl: jax.Array
    mpr: jax.Array
    misc: jax.Array    # [B, M_NMISC]
    steps: jax.Array   # [B, bt_lmax]


class FWConfig(NamedTuple):
    gap_mode: int
    align_mode: int
    pn: int
    R: int
    Wq: int      # full padded width (>= qlen+1, multiple of 128)
    P: int
    O: int
    m: int
    use_zdrop: bool
    bt_lmax: int
    G: int       # instances packed per program (sublane dim)
    banded: bool = True   # False: unbanded (-b -1), beg=0 end=qlen per row
    # local mode (-m1, always unbanded): zero first row, 0-clamped cells,
    # best = max over all cells (ref simd_abpoa_align.c local paths)


def _log2(x: int) -> int:
    return int(x - 1).bit_length()


def make_fw_kernel(cfg: FWConfig):
    pn, R, Wq, G = cfg.pn, cfg.R, cfg.Wq, cfg.G
    gm = cfg.gap_mode
    extend = cfg.align_mode == EXTEND_MODE
    local = cfg.align_mode == LOCAL_MODE
    track_best = extend or local

    def iota():
        return jax.lax.broadcasted_iota(jnp.int32, (G, Wq), 1)

    def kscan_max(gv):
        """Kogge-Stone running max along lanes (prefix over the row)."""
        l = iota()
        for k in range(_log2(Wq)):
            d = 1 << k
            gv = jnp.maximum(gv, jnp.where(l >= d, pltpu.roll(gv, d, 1),
                                           NEG))
        return gv

    def kernel(scal, bases, pre_idx, pre_n, out_idx, out_n, remain, qp,
               mpl0, mpr0, rowmask,
               begsn_o, endsn_o, mpl_o, mpr_o, misc_o, steps_o,
               Hb, E1b, E2b, F1b, F2b, colv, qasm, asmH, asmE1, asmE2):
        l = iota()
        seg = l // pn

        def sc(g, k):
            return scal[0, g, k]

        def col(c):
            """(G, 1) column c of the per-g scalar staging buffer."""
            return colv[:, c:c + 1]

        # per-g static scalars
        infs = [sc(g, S_INF) for g in range(G)]
        qlens = [sc(g, S_QLEN) for g in range(G)]
        n_rowss = [sc(g, S_NROWS) for g in range(G)]
        ws = [sc(g, S_W) for g in range(G)]
        rem_ends = [sc(g, S_REMEND) for g in range(G)]
        dp_sns = [sc(g, S_DPSN) for g in range(G)]
        # gap params are shared across the batch (same Params)
        e1 = sc(0, S_E1)
        o1 = sc(0, S_O1)
        oe1 = sc(0, S_OE1)
        e2 = sc(0, S_E2)
        o2 = sc(0, S_O2)
        oe2 = sc(0, S_OE2)
        zdrop = sc(0, S_ZDROP)
        # (G, 1) columns of instance constants
        for g in range(G):
            colv[g:g + 1, 0:1] = infs[g].reshape(1, 1)
            colv[g:g + 1, 1:2] = qlens[g].reshape(1, 1)
            colv[g:g + 1, 2:3] = dp_sns[g].reshape(1, 1)
        infc = col(0)
        qlenc = col(1)
        dpsnc = col(2)

        max_nr = n_rowss[0]
        for g in range(1, G):
            max_nr = jnp.maximum(max_nr, n_rowss[g])

        def copy_state(t, _):
            for g in range(G):
                mpl_o[0, g, t] = mpl0[0, g, t]
                mpr_o[0, g, t] = mpr0[0, g, t]
                begsn_o[0, g, t] = 0
                endsn_o[0, g, t] = 0
            return 0
        # rows beyond every instance's n_rows are never read: bound the
        # init and the sweep by the group's actual max row count
        jax.lax.fori_loop(0, max_nr, copy_state, 0)

        def ad_bounds(g, t):
            if not cfg.banded:
                # reference: band disabled (wb < 0) computes full rows
                # (GET_AD_DP_BEGIN/END gated on wb, abpoa_align.h:31-35)
                return jnp.int32(0), qlens[g]
            rem = remain[0, g, t] - rem_ends[g] - 1
            beg = jnp.maximum(0, jnp.minimum(mpl_o[0, g, t],
                                             qlens[g] - rem) - ws[g])
            end = jnp.minimum(qlens[g], jnp.maximum(mpr_o[0, g, t],
                                                    qlens[g] - rem)
                              + ws[g])
            return beg, end

        # ---------------- first row (ref :553-662) ----------------
        for g in range(G):
            mpl_o[0, g, 0] = 0
            mpr_o[0, g, 0] = 0
            for o in range(cfg.O):
                @pl.when(o < out_n[0, g, 0])
                def _():
                    tgt = out_idx[0, g, o]
                    mpl_o[0, g, tgt] = 1
                    mpr_o[0, g, tgt] = 1
            _, end0 = ad_bounds(g, 0)
            end_sn0 = end0 // pn
            endsn_o[0, g, 0] = end_sn0
            colv[g:g + 1, 3:4] = end_sn0.reshape(1, 1)
        end_sn0c = col(3)
        _esn0 = jnp.minimum(end_sn0c + 1, dpsnc - 1)
        hi_mask = seg <= _esn0
        de_mask = l <= (end_sn0c + 1) * pn - 1
        inf = infc
        if local:
            # ref: local first row is all zeros (dp_xla _init_row local)
            z = jnp.zeros((G, Wq), jnp.int32)
            Hb[:, 0, :] = z
            if gm != LINEAR_GAP:
                E1b[:, 0, :] = z
                F1b[:, 0, :] = z
            if gm == CONVEX_GAP:
                E2b[:, 0, :] = z
                F2b[:, 0, :] = z
        elif gm == LINEAR_GAP:
            h0 = jnp.where(de_mask, -e1 * l, jnp.where(hi_mask, inf, 0))
            Hb[:, 0, :] = h0
        else:
            f1v = -o1 - e1 * l
            if gm == CONVEX_GAP:
                f2v = -o2 - e2 * l
                hv = jnp.maximum(f1v, f2v)
            else:
                hv = f1v
            h0 = jnp.where(de_mask & (l >= 1), hv,
                           jnp.where(hi_mask, inf, 0))
            h0 = jnp.where(l == 0, 0, h0)
            Hb[:, 0, :] = h0
            e1r = jnp.where(l == 0, -oe1, jnp.where(hi_mask, inf, 0))
            E1b[:, 0, :] = e1r
            f1r = jnp.where(de_mask & (l >= 1), f1v,
                            jnp.where(l == 0, inf, 0))
            F1b[:, 0, :] = f1r
            if gm == CONVEX_GAP:
                E2b[:, 0, :] = jnp.where(l == 0, -oe2,
                                            jnp.where(hi_mask, inf, 0))
                F2b[:, 0, :] = jnp.where(de_mask & (l >= 1), f2v,
                                            jnp.where(l == 0, inf, 0))

        # ---------------- row sweep ----------------
        def body(t, carry):
            # carry: per-g tuples
            bss, bis, bjs, brems, stops, cells = carry
            actives = [(t <= n_rowss[g] - 2) & jnp.logical_not(stops[g])
                       & (rowmask[0, g, t] > 0)
                       for g in range(G)]

            # --- per-g band + control scalars -> colv columns ---
            beg_sns = []
            end_sns = []
            for g in range(G):
                beg, end = ad_bounds(g, t)
                beg_sn = beg // pn
                min_pb = jnp.int32(1 << 30)
                max_pe = jnp.int32(-1)
                for p in range(cfg.P):
                    pv = p < pre_n[0, g, t]
                    pred = pre_idx[0, g, t * cfg.P + p]
                    min_pb = jnp.minimum(
                        min_pb, jnp.where(pv, begsn_o[0, g, pred],
                                          1 << 30))
                    max_pe = jnp.maximum(
                        max_pe, jnp.where(pv, endsn_o[0, g, pred], -1))
                beg_sn = jnp.maximum(beg_sn, min_pb)
                end_sn = end // pn
                beg_sns.append(beg_sn)
                end_sns.append(end_sn)

                begsn_o[0, g, t] = beg_sn
                endsn_o[0, g, t] = end_sn
                colv[g:g + 1, 4:5] = beg_sn.reshape(1, 1)
                colv[g:g + 1, 5:6] = end_sn.reshape(1, 1)
                base = bases[0, g, t]
                qasm[g:g + 1, :] = qp[0, g, pl.ds(base, 1), :]
            begc = col(4)
            endc = col(5)
            capc = jnp.minimum(endc + 1, dpsnc - 1)
            band = (seg >= begc) & (seg <= endc)
            qrow = jnp.where((l >= 1) & (l <= qlenc), qasm[:, :], 0)

            # --- merges over predecessors (port of dp_xla._merge_preds) ---
            h = jnp.zeros((G, Wq), jnp.int32)
            e1v = h
            e2v = h
            for p in range(cfg.P):
                for g in range(G):
                    pred = pre_idx[0, g, t * cfg.P + p]
                    pv = p < pre_n[0, g, t]
                    colv[g:g + 1, 6:7] = jnp.where(
                        pv, begsn_o[0, g, pred], 1 << 29).reshape(1, 1)
                    colv[g:g + 1, 7:8] = jnp.where(
                        pv, endsn_o[0, g, pred], -(1 << 29)).reshape(1, 1)
                    colv[g:g + 1, 8:9] = pv.astype(jnp.int32).reshape(1, 1)
                    asmH[g:g + 1, :] = Hb[g, pl.ds(pred, 1), :]
                    if gm != LINEAR_GAP:
                        asmE1[g:g + 1, :] = E1b[g, pl.ds(pred, 1), :]
                        if gm == CONVEX_GAP:
                            asmE2[g:g + 1, :] = E2b[g, pl.ds(pred, 1), :]
                pbegc = col(6)
                pendc = col(7)
                pvc = col(8) > 0
                if local:
                    # ref local: merges span the full row, boundary = 0
                    _begc = begc
                    _endc = endc
                else:
                    _begc = jnp.maximum(begc, pbegc)
                    _endc = jnp.minimum(jnp.minimum(pendc + 1, endc),
                                        dpsnc - 1)
                preH = asmH[:, :]
                cand = jnp.where(l >= 1, pltpu.roll(preH, 1, 1), NEG)
                bcol = _begc * pn
                if local:
                    boundary = jnp.zeros((G, 1), jnp.int32)
                else:
                    boundary = jnp.where(pbegc < begc, cand, infc)
                cand = jnp.where(l == bcol, boundary, cand)
                if gm == LINEAR_GAP:
                    cand = jnp.maximum(cand + qrow, preH - e1)
                mmask = (seg >= _begc) & (seg <= _endc) & pvc
                if p == 0:
                    if not local:
                        fill = (((seg >= begc) & (seg < _begc))
                                | ((seg > _endc) & (seg <= capc)))
                        h = jnp.where(fill, infc, h)
                    h = jnp.where(mmask, cand, h)
                else:
                    h = jnp.where(mmask, jnp.maximum(h, cand), h)
                if gm != LINEAR_GAP:
                    _ende = jnp.minimum(pendc, endc)
                    emask = (seg >= _begc) & (seg <= _ende) & pvc
                    if p == 0:
                        if not local:
                            efill = (((seg >= begc) & (seg < _begc))
                                     | ((seg > _ende) & (seg <= endc)))
                            e1v = jnp.where(efill, infc, e1v)
                        e1v = jnp.where(emask, asmE1[:, :], e1v)
                        if gm == CONVEX_GAP:
                            if not local:
                                e2v = jnp.where(efill, infc, e2v)
                            e2v = jnp.where(emask, asmE2[:, :], e2v)
                    else:
                        e1v = jnp.where(emask,
                                        jnp.maximum(e1v, asmE1[:, :]), e1v)
                        if gm == CONVEX_GAP:
                            e2v = jnp.where(emask,
                                            jnp.maximum(e2v, asmE2[:, :]),
                                            e2v)

            lo = begc * pn

            def f_scan(src, e, oe, seed):
                rel = l - lo
                gv = jnp.where(band, jnp.maximum(src, infc) + rel * e, NEG)
                M = kscan_max(gv)
                Pm = jnp.where(l >= 1, pltpu.roll(M, 1, 1), NEG)
                F = Pm - oe - (rel - 1) * e
                F = jnp.where(l == lo, seed - oe, F)
                return jnp.maximum(F, infc)

            def seed_of(h0):
                return jnp.sum(jnp.where(l == lo, h0, 0), axis=1,
                               keepdims=True)

            # --- F phase + fold (port of dp_xla row body) ---
            if gm == LINEAR_GAP:
                rel = l - lo
                gv = jnp.where(band, jnp.maximum(h, infc) + rel * e1, NEG)
                hfin = jnp.maximum(kscan_max(gv) - rel * e1, infc)
                if local:
                    hfin = jnp.maximum(hfin, 0)
                hrow = jnp.where(band, hfin, h)
            elif gm != CONVEX_GAP:
                h0 = h + jnp.where(band, qrow, 0)
                seed = seed_of(h0)
                f1 = f_scan(jnp.where(band, h0, NEG), e1, oe1, seed)
                h1 = jnp.maximum(h0, e1v)
                hh = jnp.maximum(h1, f1)
                if local:
                    hh = jnp.maximum(hh, 0)
                e1n = jnp.maximum(e1v - e1, hh - oe1)
                e1fin = jnp.where(hh == h1, e1n,
                                  jnp.int32(0) if local else infc)
                hrow = jnp.where(band, hh, h0)
                e1row = jnp.where(band, e1fin, e1v)
                f1row = jnp.where(band, f1, 0)
            else:
                h0 = h + jnp.where(band, qrow, 0)
                seed = seed_of(h0)
                hpf = jnp.maximum(jnp.maximum(h0, e1v), e2v)
                hpf = jnp.where(band, hpf, NEG)
                f1 = f_scan(hpf, e1, oe1, seed)
                f2 = f_scan(hpf, e2, oe2, seed)
                hh = jnp.maximum(jnp.maximum(hpf, f1), f2)
                if local:
                    hh = jnp.maximum(hh, 0)
                e1n = jnp.maximum(e1v - e1, hh - oe1)
                e2n = jnp.maximum(e2v - e2, hh - oe2)
                if local:
                    e1n = jnp.maximum(e1n, 0)
                    e2n = jnp.maximum(e2n, 0)
                hrow = jnp.where(band, hh, h0)
                e1row = jnp.where(band, e1n, e1v)
                e2row = jnp.where(band, e2n, e2v)
                f1row = jnp.where(band, f1, 0)
                f2row = jnp.where(band, f2, 0)

            Hb[:, t, :] = hrow
            if gm != LINEAR_GAP:
                E1b[:, t, :] = e1row
                F1b[:, t, :] = f1row
            if gm == CONVEX_GAP:
                E2b[:, t, :] = e2row
                F2b[:, t, :] = f2row

            # --- row max with reference tie-breaks (port of dp_xla) ---
            # per-lane winner over band segments with reference tie-breaks:
            # lexicographic max over (value, -prio); prio and the winning
            # segment pack into one aux word (prio is unique per segment,
            # so ordering by prio-major never consults wseg)
            lseg_rel = seg - begc
            n_segc = endc - begc + 1
            v = jnp.where(band & (l <= qlenc), hrow, infc)
            prio = jnp.where(lseg_rel == n_segc - 1, -1, lseg_rel)
            aux = prio * 1024 + lseg_rel          # minimize aux-major
            SBmax = Wq // pn
            for k in range(_log2(SBmax)):
                d = pn << k
                ok = l < (Wq - d)
                vb = pltpu.roll(v, Wq - d, 1)
                ab_ = pltpu.roll(aux, Wq - d, 1)
                take = ((vb > v) | ((vb == v) & (ab_ < aux))) & ok
                v = jnp.where(take, vb, v)
                aux = jnp.where(take, ab_, aux)
            # winners accumulate toward lower lanes: the pn-lane block at
            # the band start holds the full reduction per lane
            lane_in_first = (l >= lo) & (l < lo + pn)
            gmax = jnp.max(jnp.where(lane_in_first, v, NEG), axis=1,
                           keepdims=True)
            lane_pick = jnp.min(jnp.where(lane_in_first & (v == gmax),
                                          l - lo, 1 << 30), axis=1,
                                keepdims=True)
            aux_pick = jnp.sum(jnp.where(l - lo == lane_pick, aux, 0),
                               axis=1, keepdims=True)
            wseg_pick = aux_pick - (aux_pick // 1024) * 1024
            # absolute col = (begc + wseg_pick)*pn + lane_pick
            maxi_c = jnp.where(gmax > infc,
                               (begc + wseg_pick) * pn + lane_pick,
                               -1)

            new_bss, new_bis, new_bjs, new_brems = [], [], [], []
            new_stops, new_cells = [], []
            for g in range(G):
                ig = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                mx = jnp.sum(jnp.where(ig == g, gmax, 0))
                mi = jnp.sum(jnp.where(ig == g, maxi_c, 0))
                bs, bi, bj, brem = bss[g], bis[g], bjs[g], brems[g]
                stop_now = jnp.bool_(False)
                if track_best:
                    better = mx > bs
                    if extend and cfg.use_zdrop:
                        delta = brem - remain[0, g, t]
                        zlim = zdrop + e1 * jnp.abs(delta - (mi - bj))
                        stop_now = jnp.logical_not(better) \
                            & (bs - mx > zlim)
                    bs = jnp.where(actives[g] & better, mx, bs)
                    bi = jnp.where(actives[g] & better, t, bi)
                    bj = jnp.where(actives[g] & better, mi, bj)
                    brem = jnp.where(actives[g] & better, remain[0, g, t],
                                     brem)
                    stop_now = actives[g] & stop_now

                out_i = mi + 1
                non = out_n[0, g, t]
                do_scat = actives[g] & jnp.logical_not(stop_now)
                for o in range(cfg.O):
                    oko = do_scat & (o < non)
                    tgt = out_idx[0, g, t * cfg.O + o]
                    vmax_ = jnp.where(oko, out_i, NEG)
                    vmin_ = jnp.where(oko, out_i, jnp.int32(1 << 29))
                    mpr_o[0, g, tgt] = jnp.maximum(mpr_o[0, g, tgt],
                                                   vmax_)
                    mpl_o[0, g, tgt] = jnp.minimum(mpl_o[0, g, tgt],
                                                   vmin_)
                new_bss.append(bs)
                new_bis.append(bi)
                new_bjs.append(bj)
                new_brems.append(brem)
                new_stops.append(stops[g] | stop_now)
                new_cells.append(cells[g] + jnp.where(
                    actives[g], (end_sns[g] - beg_sns[g] + 1) * pn, 0))
            return (tuple(new_bss), tuple(new_bis), tuple(new_bjs),
                    tuple(new_brems), tuple(new_stops), tuple(new_cells))

        init = (tuple(infs), tuple(jnp.int32(0) for _ in range(G)),
                tuple(jnp.int32(0) for _ in range(G)),
                tuple(remain[0, g, 0] for g in range(G)),
                tuple(jnp.bool_(False) for _ in range(G)),
                tuple(jnp.int32(0) for _ in range(G)))
        bss, bis, bjs, brems, stops, cells = jax.lax.fori_loop(
            1, jnp.minimum(max_nr - 1, R - 1), body, init)
        bss, bis, bjs = list(bss), list(bis), list(bjs)

        iq = jax.lax.broadcasted_iota(jnp.int32, (1, Wq), 1)
        for g in range(G):
            if cfg.align_mode == GLOBAL_MODE:
                sink = n_rowss[g] - 1
                for p in range(cfg.P):
                    pv = p < pre_n[0, g, sink]
                    pred = pre_idx[0, g, sink * cfg.P + p]
                    ec = jnp.minimum(qlens[g],
                                     (endsn_o[0, g, pred] + 1) * pn - 1)
                    row = Hb[g, pl.ds(pred, 1), :]
                    val = jnp.sum(jnp.where(iq == ec, row, 0))
                    better = pv & (val > bss[g])
                    bss[g] = jnp.where(better, val, bss[g])
                    bis[g] = jnp.where(better, pred, bis[g])
                    bjs[g] = jnp.where(better, ec, bjs[g])
            misc_o[0, g, M_BEST] = bss[g]
            misc_o[0, g, M_BI] = bis[g]
            misc_o[0, g, M_BJ] = bjs[g]
            misc_o[0, g, M_CELLS] = cells[g]
            misc_o[0, g, M_OVFL] = 0

        # ------------- in-kernel backtrack (absolute columns) -------------
        if cfg.bt_lmax:
            for g in range(G):
                def lane_at(rowv, c):
                    vv = jnp.sum(jnp.where(iq == c, rowv, 0))
                    return jnp.where((c >= 0) & (c < Wq), vv, 0)

                def cell2(ref, i, j):
                    rowv = ref[g, pl.ds(i, 1), :]
                    return lane_at(rowv, j), lane_at(rowv, j - 1)

                def in_band_bt(i, c):
                    return ((begsn_o[0, g, i] * pn <= c)
                            & (c <= (endsn_o[0, g, i] + 1) * pn - 1))

                def bt_body(state):
                    i, j, cur_op, if_, nst, fail, done = state
                    hij, h_prev = cell2(Hb, i, j)
                    zero_stop = jnp.bool_(local) & (hij == 0)
                    base = bases[0, g, i]
                    s = lane_at(qp[0, g, pl.ds(base, 1), :], j)
                    if gm != LINEAR_GAP:
                        e1ij, _ = cell2(E1b, i, j)
                        f1ij, f1prev = cell2(F1b, i, j)
                    if gm == CONVEX_GAP:
                        e2ij, _ = cell2(E2b, i, j)
                        f2ij, f2prev = cell2(F2b, i, j)
                    m_hits = []
                    e_conds = []
                    e_newop = []
                    e_pred = []
                    for p in range(cfg.P):
                        pre = pre_idx[0, g, i * cfg.P + p]
                        pv = p < pre_n[0, g, i]
                        hpre, hpre1 = cell2(Hb, pre, j)
                        m_hits.append(pv & in_band_bt(pre, j - 1)
                                      & (hpre1 + s == hij))
                        okp = pv & in_band_bt(pre, j)
                        if gm != LINEAR_GAP:
                            e1pre, _ = cell2(E1b, pre, j)
                            hit_m = (cur_op & BT_M > 0) & (hij == e1pre)
                            hit_x = (cur_op & BT_M == 0) \
                                & (e1ij == e1pre - e1)
                            e_conds.append(okp & (cur_op & BT_E1 > 0)
                                           & (hit_m | hit_x))
                            e_newop.append(jnp.where(
                                hpre - oe1 == e1pre,
                                jnp.int32(BT_M | BT_F), jnp.int32(BT_E1)))
                            e_pred.append(pre)
                            if gm == CONVEX_GAP:
                                e2pre, _ = cell2(E2b, pre, j)
                                hm2 = (cur_op & BT_M > 0) & (hij == e2pre)
                                hx2 = (cur_op & BT_M == 0) \
                                    & (e2ij == e2pre - e2)
                                e_conds.append(okp & (cur_op & BT_E2 > 0)
                                               & (hm2 | hx2))
                                e_newop.append(jnp.where(
                                    hpre - oe2 == e2pre,
                                    jnp.int32(BT_M | BT_F),
                                    jnp.int32(BT_E2)))
                                e_pred.append(pre)
                        else:
                            e_conds.append(okp & (hpre - e1 == hij))
                            e_newop.append(jnp.int32(BT_ALL))
                            e_pred.append(pre)
                    m_pick = jnp.int32(-1)
                    for k in reversed(range(cfg.P)):
                        m_pick = jnp.where(m_hits[k], jnp.int32(k), m_pick)
                    m_possible = m_pick >= 0
                    e_pick = jnp.int32(-1)
                    for k in reversed(range(len(e_conds))):
                        e_pick = jnp.where(e_conds[k], jnp.int32(k),
                                           e_pick)
                    e_possible = e_pick >= 0
                    e_pred_sel = jnp.int32(0)
                    e_op_sel = jnp.int32(BT_ALL)
                    for k in range(len(e_conds)):
                        selk = e_pick == k
                        e_pred_sel = jnp.where(selk, e_pred[k], e_pred_sel)
                        e_op_sel = jnp.where(selk, e_newop[k], e_op_sel)
                    if gm == LINEAR_GAP:
                        f_possible = h_prev - e1 == hij
                        f_op_sel = jnp.int32(BT_ALL)
                    else:
                        f1_open = h_prev - oe1 == f1ij
                        f1_ext = f1prev - e1 == f1ij
                        f1_gate = jnp.where(cur_op & BT_M > 0,
                                            hij == f1ij, True)
                        hit_f1 = (cur_op & BT_F1 > 0) & f1_gate \
                            & (f1_open | f1_ext)
                        op_f1 = jnp.where(f1_open, jnp.int32(BT_M | BT_E),
                                          jnp.int32(BT_F1))
                        if gm == CONVEX_GAP:
                            f2_open = h_prev - oe2 == f2ij
                            f2_ext = f2prev - e2 == f2ij
                            f2_gate = jnp.where(cur_op & BT_M > 0,
                                                hij == f2ij, True)
                            hit_f2 = (cur_op & BT_F2 > 0) & f2_gate \
                                & (f2_open | f2_ext)
                            op_f2 = jnp.where(f2_open,
                                              jnp.int32(BT_M | BT_E),
                                              jnp.int32(BT_F2))
                        else:
                            hit_f2 = jnp.bool_(False)
                            op_f2 = jnp.int32(BT_ALL)
                        f_possible = hit_f1 | hit_f2
                        f_op_sel = jnp.where(hit_f1, op_f1, op_f2)
                    use_m1 = (cur_op & BT_M > 0) & jnp.logical_not(if_) \
                        & m_possible
                    if gm == LINEAR_GAP:
                        use_e = jnp.logical_not(use_m1) & e_possible
                    else:
                        use_e = jnp.logical_not(use_m1) \
                            & (cur_op & BT_E > 0) & e_possible
                    use_f = (jnp.logical_not(use_m1)
                             & jnp.logical_not(use_e) & f_possible)
                    if gm != LINEAR_GAP:
                        use_f = use_f & (cur_op & BT_F > 0)
                    if gm == LINEAR_GAP:
                        use_m2 = (jnp.logical_not(use_m1)
                                  & jnp.logical_not(use_e)
                                  & jnp.logical_not(use_f) & if_
                                  & m_possible)
                    else:
                        use_m2 = (jnp.logical_not(use_m1)
                                  & jnp.logical_not(use_e)
                                  & jnp.logical_not(use_f)
                                  & (cur_op & BT_M > 0) & if_ & m_possible)
                    any_hit = (use_m1 | use_e | use_f | use_m2) \
                        & jnp.logical_not(zero_stop)
                    fail = fail | jnp.logical_not(any_hit | zero_stop)
                    use_m = use_m1 | use_m2
                    m_pred = jnp.int32(0)
                    for p in range(cfg.P):
                        m_pred = jnp.where(
                            m_pick == p, pre_idx[0, g, i * cfg.P + p],
                            m_pred)
                    op_code = jnp.where(use_m, 0,
                                        jnp.where(use_e, 2, 1))

                    @pl.when(any_hit)
                    def _():
                        steps_o[0, g, nst] = op_code | (i << 2) | (j << 14)
                    nst = jnp.where(any_hit, nst + 1, nst)
                    new_i = jnp.where(use_m, m_pred,
                                      jnp.where(use_e, e_pred_sel, i))
                    new_j = jnp.where(use_m | use_f, j - 1, j)
                    new_cur = jnp.where(
                        use_m, jnp.int32(BT_ALL),
                        jnp.where(use_e, e_op_sel,
                                  jnp.where(use_f, f_op_sel, cur_op)))
                    new_if = jnp.where(use_m, jnp.bool_(False), if_)
                    done = (fail | zero_stop
                            | (new_i <= 0) | (new_j <= 0))
                    return (new_i, new_j, new_cur, new_if, nst, fail,
                            done)

                def bt_cond(state):
                    i, j, cur_op, if_, nst, fail, done = state
                    return jnp.logical_not(done) & (nst < cfg.bt_lmax)

                bt_init = (bis[g], bjs[g], jnp.int32(BT_ALL),
                           jnp.bool_(True), jnp.int32(0), jnp.bool_(False),
                           (bis[g] <= 0) | (bjs[g] <= 0))
                (ei, ej, _, _, nst, btfail, _) = jax.lax.while_loop(
                    bt_cond, bt_body, bt_init)
                misc_o[0, g, M_NSTEPS] = nst
                misc_o[0, g, M_FAIL] = btfail.astype(jnp.int32)
                misc_o[0, g, M_ENDI] = ei
                misc_o[0, g, M_ENDJ] = ej
        else:
            for g in range(G):
                misc_o[0, g, M_NSTEPS] = 0
                misc_o[0, g, M_FAIL] = 0
                misc_o[0, g, M_ENDI] = 0
                misc_o[0, g, M_ENDJ] = 0

    return kernel


@partial(jax.jit, static_argnums=(0, 12))
def fw_poa_dp_batch(cfg: FWConfig, scal, bases, pre_idx, pre_n,
                    out_idx, out_n, remain, qcodes, mpl0, mpr0, rowmask,
                    interpret=False):
    """Batched full-width DP+backtrack. B must be a multiple of cfg.G;
    arrays are [B, ...] (narrow dtypes fine) and get grouped [B/G, G, ...].
    """
    B = bases.shape[0]
    G = cfg.G
    assert B % G == 0
    NP_ = B // G
    R, Wq = cfg.R, cfg.Wq
    gm_ = cfg.gap_mode
    i32 = jnp.int32
    scal, mat = scal[:, :S_NSCAL].astype(i32), scal[:, S_NSCAL:]
    codes = qcodes.astype(i32)
    onehot = (codes[:, None, :]
              == jnp.arange(cfg.m, dtype=i32)[None, :, None])
    matb = mat.reshape(B, cfg.m, cfg.m).astype(i32)
    qp = jnp.einsum("bkc,bcj->bkj", matb, onehot.astype(i32),
                    preferred_element_type=i32)

    def grp(x, *shape):
        return x.astype(i32).reshape(NP_, G, *(shape if shape else (-1,)))

    kern = make_fw_kernel(cfg)

    def vmem(*shape):
        return pl.BlockSpec((1, G, *shape),
                            lambda b: (b, 0, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    def smem(*shape):
        return pl.BlockSpec((1, G, *shape),
                            lambda b: (b, 0, *([0] * len(shape))),
                            memory_space=pltpu.SMEM)

    LS = max(cfg.bt_lmax, 8)
    out_shapes = (
        jax.ShapeDtypeStruct((NP_, G, R), i32),       # beg_sn
        jax.ShapeDtypeStruct((NP_, G, R), i32),       # end_sn
        jax.ShapeDtypeStruct((NP_, G, R), i32),       # mpl
        jax.ShapeDtypeStruct((NP_, G, R), i32),       # mpr
        jax.ShapeDtypeStruct((NP_, G, M_NMISC), i32),
        jax.ShapeDtypeStruct((NP_, G, LS), i32),      # steps
    )
    out_specs = (smem(R), smem(R), smem(R), smem(R),
                 smem(M_NMISC), smem(LS))
    in_specs = [smem(S_NSCAL), smem(R), smem(R * cfg.P), smem(R),
                smem(R * cfg.O), smem(R), smem(R), vmem(cfg.m, cfg.Wq),
                smem(R), smem(R), smem(R)]
    # DP planes are scratch: they never leave the kernel (the backtrack
    # runs in-kernel), so no HBM blocks and no pipeline double-buffering —
    # VMEM budget ~= 5*G*R*Wq*4B for convex, 3 planes affine, 1 linear.
    full = pltpu.VMEM((G, R, Wq), i32)
    dummy = pltpu.VMEM((G, 1, 128), i32)
    if gm_ == CONVEX_GAP:
        planes_scratch = [full, full, full, full, full]
    elif gm_ == LINEAR_GAP:
        planes_scratch = [full, dummy, dummy, dummy, dummy]
    else:
        planes_scratch = [full, full, dummy, full, dummy]
    outs = pl.pallas_call(
        kern,
        grid=(NP_,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=planes_scratch + [
            pltpu.VMEM((G, 128), i32),   # colv per-g scalar staging
            pltpu.VMEM((G, Wq), i32),    # qasm
            pltpu.VMEM((G, Wq), i32),    # asmH
            pltpu.VMEM((G, Wq), i32),    # asmE1
            pltpu.VMEM((G, Wq), i32),    # asmE2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(grp(scal), grp(bases), grp(pre_idx), grp(pre_n), grp(out_idx),
      grp(out_n), grp(remain), grp(qp, cfg.m, cfg.Wq), grp(mpl0),
      grp(mpr0), grp(rowmask))
    (beg_sn, end_sn, mpl, mpr, misc, steps) = outs
    return FWOut(beg_sn.reshape(B, R), end_sn.reshape(B, R),
                 mpl.reshape(B, R), mpr.reshape(B, R),
                 misc.reshape(B, M_NMISC), steps.reshape(B, LS))