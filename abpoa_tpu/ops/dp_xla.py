"""Batched banded POA sequence-to-DAG DP for TPU (pure JAX/XLA).

TPU-first re-expression of abPOA's striped-SIMD DP engine
(reference: /root/reference/src/simd_abpoa_align.c:434-1412). The reference
processes one read at a time with 8/32-lane SIMD vectors inside a row; here
the whole row band is one vector op and the *batch of instances* provides the
parallel width (vmap over instances -> VPU lanes), which is how a chip gets
filled: one POA instance is far too small on its own.

Semantics vs the host oracle (align/engine_np.py, itself bit-exact to the
reference):

  * identical band geometry: adaptive band snapped to pn-lane segments
    (pn = 32/16 chosen by the same 16/32-bit score-width dispatch), beg_sn
    clamped to the earliest predecessor segment (ref :1305-1318),
  * identical M/E merge fill/overwrite regions incl. the end_sn+1 guard
    segment the reference inf-fills so the next row's shifted merge never
    reads unwritten memory (ref :1332-1350),
  * the per-segment masked log-step F ladder + carry chain (SIMD_SET_F,
    ref :664-699) is replaced by its closed form: F[j] =
    max_{k<j}(h[k] - oe - (j-k)*e), computed with one jax.lax.cummax over the
    row, plus the reference's first-lane seed quirk F[lo] = h_preE[lo] - oe
    (ref :1381). The closed form is exactly equal to the reference ladder for
    every cell reachable from a real (in-band) score; it deviates only in the
    "garbage zone" (values within ~31*gap_ext of inf_min, i.e. cells whose
    only inputs are band-edge infinity fills), where the ladder's set_num
    masking and its max-with-inf lifting quirks shape values that sit several
    orders of magnitude below any reachable alignment score. Scores, row
    maxima, adaptive bands, cigars and therefore output bytes are unaffected
    (validated cell-for-cell against the oracle on all fixtures); the sole
    theoretical exception is an alignment sitting exactly at the 16-bit
    dispatch bound where real scores approach INT16_MIN.
  * DP planes are zero-initialized each call instead of carrying the
    reference's arena residue: the fill regions above make every cell the DP
    *reads* a written cell, so residue is unreachable (verified by running
    the full golden suite with a scrubbed arena).

Alignment modes: global / local / extend (z-drop), gap modes: linear /
affine / convex, matching abpoa_para_t (ref include/abpoa.h:62-81).
Backtrack stays on the host (align/engine_jax.py) over the returned planes,
preserving the reference's M->D->I / indel_first tie-breaking exactly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (GLOBAL_MODE, LOCAL_MODE, EXTEND_MODE,
                      LINEAR_GAP, AFFINE_GAP, CONVEX_GAP)

# sentinel below any clamped score; plain int so importing this module never
# touches a backend (the multichip dry run re-pins the platform post-import)
NEG = -(1 << 29)


class DPConfig(NamedTuple):
    """Static (compile-time) kernel configuration. One XLA program per value."""
    gap_mode: int
    align_mode: int
    pn: int        # lane-snap width from the 16/32-bit dispatch (32 or 16)
    R: int         # padded row (node) capacity
    W: int         # padded band width in columns; multiple of pn
    P: int         # padded max in-degree
    O: int         # padded max out-degree
    banded: bool   # wb >= 0
    use_zdrop: bool


class DPInputs(NamedTuple):
    """Per-instance dynamic inputs (stack along axis 0 for a batch)."""
    bases: jax.Array     # [R] i32 base code per dp row (row0 = src)
    pre_idx: jax.Array   # [R,P] i32 predecessor dp rows
    pre_n: jax.Array     # [R] i32
    out_idx: jax.Array   # [R,O] i32 successor dp rows
    out_n: jax.Array     # [R] i32
    remain: jax.Array    # [R] i32 max_remain per dp row
    mpl: jax.Array       # [R] i32 max_pos_left per dp row
    mpr: jax.Array       # [R] i32 max_pos_right
    qcol: jax.Array      # [W] i32 query code at column j (= query[j-1])
    mat: jax.Array       # [m,m] i32 score matrix
    qlen: jax.Array      # scalar i32
    n_rows: jax.Array    # scalar i32 (incl. src+sink rows)
    w: jax.Array         # scalar i32 band half-width wb + wf*qlen
    inf_min: jax.Array   # scalar i32 from the 16/32-bit dispatch
    remain_end: jax.Array  # scalar i32 max_remain[end node]
    e1: jax.Array
    o1: jax.Array
    oe1: jax.Array
    e2: jax.Array
    o2: jax.Array
    oe2: jax.Array
    zdrop: jax.Array
    max_mat: jax.Array   # scalar i32 (unused in DP; kept for API symmetry)


class DPOutputs(NamedTuple):
    H: jax.Array         # [R,W]
    E1: jax.Array
    E2: jax.Array
    F1: jax.Array
    F2: jax.Array
    dp_beg: jax.Array    # [R]
    dp_end: jax.Array    # [R]
    best_score: jax.Array
    best_i: jax.Array
    best_j: jax.Array
    mpl: jax.Array       # [R] updated adaptive-band state
    mpr: jax.Array
    n_cells: jax.Array   # scalar i32: band cells computed (perf counter)


def _ad_bounds(cfg, inp, mpl_t, mpr_t, remain_t):
    """ref GET_AD_DP_BEGIN/END (abpoa_align.h:34-35)."""
    rem = remain_t - inp.remain_end - 1
    beg = jnp.maximum(0, jnp.minimum(mpl_t, inp.qlen - rem) - inp.w)
    end = jnp.minimum(inp.qlen, jnp.maximum(mpr_t, inp.qlen - rem) + inp.w)
    return beg, end


def _row_max(cfg, iota, seg, Hrow, beg_sn, end_sn, qlen, inf):
    """Row max + argmax with the reference's blend/tie semantics
    (ref :1043-1057): per lane, segment end_sn wins ties, then the earliest
    segment; across lanes, the lowest lane wins ties.
    """
    pn = cfg.pn
    S = cfg.W // pn
    band = (seg >= beg_sn) & (seg <= end_sn) & (iota <= qlen)
    v = jnp.where(band, Hrow, inf).reshape(S, pn)
    seg_ids = jnp.arange(S, dtype=jnp.int32)
    prio = jnp.where(seg_ids == end_sn, jnp.int32(-1), seg_ids)[:, None]
    vmax = jnp.max(v, axis=0)                       # [pn] per-lane max
    pmin = jnp.min(jnp.where(v == vmax[None, :], prio, jnp.int32(1 << 30)),
                   axis=0)                          # [pn] winning priority
    wseg = jnp.where(pmin == -1, end_sn, pmin)      # [pn] winning segment
    lanes = jnp.arange(pn, dtype=jnp.int32)
    wcol = wseg * pn + lanes
    gmax = jnp.max(vmax)
    lane_sel = jnp.argmax(vmax == gmax).astype(jnp.int32)
    max_i = jnp.where(gmax > inf, wcol[lane_sel], jnp.int32(-1))
    return gmax, max_i


def _scatter_minmax(cfg, mpl, mpr, out_idx_t, out_n_t, out_i, enable):
    """ref abpoa_ada_max_i (:1274-1282): push band hints to successors."""
    o_ids = jnp.arange(cfg.O, dtype=jnp.int32)
    valid = (o_ids < out_n_t) & enable
    tgt = jnp.where(valid, out_idx_t, jnp.int32(cfg.R - 1))
    mpr = mpr.at[tgt].max(jnp.where(valid, out_i, NEG))
    mpl = mpl.at[tgt].min(jnp.where(valid, out_i, jnp.int32(1 << 30)))
    return mpl, mpr


def _merge_preds(cfg, inp, iota, seg, planes, dp_beg_sn, dp_end_sn,
                 dp_beg, dp_end, pre_idx_t, pre_n_t, beg_sn, end_sn, dp_sn,
                 qrow, inf):
    """M + E merges over predecessors (ref :1332-1350 / lg :721-761).

    Returns the merged per-row vectors (h, e1, e2) with fill regions applied.
    For linear gap, q and the pre_H - e branch fold into h here.
    """
    local = cfg.align_mode == LOCAL_MODE
    gm = cfg.gap_mode
    H, E1, E2 = planes
    cap = jnp.minimum(end_sn + 1, dp_sn - 1)
    h = jnp.zeros(cfg.W, dtype=jnp.int32)
    e1v = h
    e2v = h
    for p in range(cfg.P):
        pv = p < pre_n_t
        pred = pre_idx_t[p]
        pre_beg_sn = dp_beg_sn[pred]
        pre_end = dp_end[pred]
        pre_end_sn = dp_end_sn[pred]
        preH = jax.lax.dynamic_index_in_dim(H, pred, 0, keepdims=False)
        if local:
            _beg_sn = jnp.int32(0)
            _end_sn = end_sn
        else:
            _beg_sn = jnp.maximum(beg_sn, pre_beg_sn)
            _end_sn = jnp.minimum(jnp.minimum((pre_end + 1) // cfg.pn,
                                              end_sn), dp_sn - 1)
        # shifted-by-one M candidate; roll supplies preH[j-1], the band's
        # first lane is overridden per the reference boundary rule
        cand = jnp.roll(preH, 1)
        lo_ = _beg_sn * cfg.pn
        if local:
            boundary = jnp.int32(0)
        else:
            boundary = jnp.where(pre_beg_sn < beg_sn,
                                 jnp.take(cand, lo_), inf)
        cand = jnp.where(iota == lo_, boundary, cand)
        if gm == LINEAR_GAP:
            cand = jnp.maximum(cand + qrow, preH - inp.e1)
        mmask = (seg >= _beg_sn) & (seg <= _end_sn) & pv
        if p == 0:
            if not local:
                fill = (((seg >= beg_sn) & (seg < _beg_sn))
                        | ((seg > _end_sn) & (seg <= cap)))
                h = jnp.where(fill, inf, h)
            h = jnp.where(mmask, cand, h)
        else:
            h = jnp.where(mmask, jnp.maximum(h, cand), h)
        if gm != LINEAR_GAP:
            _end_e = jnp.minimum(pre_end_sn, end_sn)
            emask = (seg >= _beg_sn) & (seg <= _end_e) & pv
            preE1 = jax.lax.dynamic_index_in_dim(E1, pred, 0, keepdims=False)
            if gm == CONVEX_GAP:
                preE2 = jax.lax.dynamic_index_in_dim(E2, pred, 0,
                                                     keepdims=False)
            if p == 0:
                if not local:
                    efill = (((seg >= beg_sn) & (seg < _beg_sn))
                             | ((seg > _end_e) & (seg <= end_sn)))
                    e1v = jnp.where(efill, inf, e1v)
                    if gm == CONVEX_GAP:
                        e2v = jnp.where(efill, inf, e2v)
                e1v = jnp.where(emask, preE1, e1v)
                if gm == CONVEX_GAP:
                    e2v = jnp.where(emask, preE2, e2v)
            else:
                e1v = jnp.where(emask, jnp.maximum(e1v, preE1), e1v)
                if gm == CONVEX_GAP:
                    e2v = jnp.where(emask, jnp.maximum(e2v, preE2), e2v)
    return h, e1v, e2v


def _f_scan(iota, band_mask, src, lo, e, oe, seed, inf):
    """Closed-form banded F recurrence F[j] = max(src[j-1]-oe, F[j-1]-e)
    == max_{k<j}(src[k] - oe - (j-k-1)e), with the reference's first-lane
    seed F[lo] = seed - oe (ref :1381) and a floor at inf_min standing in for
    the ladder's lift-to-inf quirk (garbage zone only; see module docstring).
    """
    rel = iota - lo
    C = jnp.where(band_mask, jnp.maximum(src, inf) + rel * e, NEG)
    M = jax.lax.cummax(C, axis=0)
    Pm = jnp.roll(M, 1)
    F = Pm - oe - (rel - 1) * e
    F = jnp.where(iota == lo, seed - oe, F)
    return jnp.maximum(F, inf)


def _h_scan_lg(iota, band_mask, h, lo, e, inf):
    """Linear-gap fold: H[j] = max_{k<=j}(h[k] - (j-k)e) (ref :762-778)."""
    rel = iota - lo
    C = jnp.where(band_mask, jnp.maximum(h, inf) + rel * e, NEG)
    M = jax.lax.cummax(C, axis=0)
    return jnp.maximum(M - rel * e, inf)


def _first_row(cfg, inp, iota, seg, planes, state):
    """ref simd_abpoa_{lg,ag,cg}_first_dp (:553-662)."""
    H, E1, E2, F1, F2 = planes
    (dp_beg, dp_end, dp_beg_sn, dp_end_sn, mpl, mpr) = state
    inf = inp.inf_min
    pn = cfg.pn
    if cfg.banded:
        mpl = mpl.at[0].set(0)
        mpr = mpr.at[0].set(0)
        o_ids = jnp.arange(cfg.O, dtype=jnp.int32)
        valid = o_ids < inp.out_n[0]
        tgt = jnp.where(valid, inp.out_idx[0], jnp.int32(cfg.R - 1))
        mpl = mpl.at[tgt].set(jnp.where(valid, jnp.int32(1), mpl[tgt]))
        mpr = mpr.at[tgt].set(jnp.where(valid, jnp.int32(1), mpr[tgt]))
        _, end = _ad_bounds(cfg, inp, mpl[0], mpr[0], inp.remain[0])
    else:
        end = inp.qlen
    dp_sn = inp.qlen // pn + 1
    beg_sn = jnp.int32(0)
    end_sn = end // pn
    dp_beg_sn = dp_beg_sn.at[0].set(beg_sn)
    dp_end_sn = dp_end_sn.at[0].set(end_sn)
    dp_beg = dp_beg.at[0].set(0)
    dp_end = dp_end.at[0].set((end_sn + 1) * pn - 1)
    _end_sn = jnp.minimum(end_sn + 1, dp_sn - 1)
    hi_mask = seg <= _end_sn          # cols [0, (_end_sn+1)*pn)
    de = (end_sn + 1) * pn - 1
    row_idx = iota
    if cfg.align_mode == LOCAL_MODE:
        z = jnp.where(hi_mask, jnp.int32(0), H[0])
        H = H.at[0].set(z)
        if cfg.gap_mode != LINEAR_GAP:
            E1 = E1.at[0].set(z)
            F1 = F1.at[0].set(z)
        if cfg.gap_mode == CONVEX_GAP:
            E2 = E2.at[0].set(z)
            F2 = F2.at[0].set(z)
        return (H, E1, E2, F1, F2), (dp_beg, dp_end, dp_beg_sn, dp_end_sn,
                                     mpl, mpr)
    filled = jnp.where(hi_mask, inf, H[0])
    in_de = row_idx <= de
    if cfg.gap_mode == LINEAR_GAP:
        hrow = jnp.where(in_de, -inp.e1 * row_idx, filled)
        H = H.at[0].set(hrow)
    elif cfg.gap_mode == AFFINE_GAP:
        E1 = E1.at[0].set(jnp.where(hi_mask, inf, E1[0]))
        f1 = -inp.o1 - inp.e1 * row_idx
        hrow = jnp.where(in_de & (row_idx >= 1), f1, filled)
        hrow = jnp.where(row_idx == 0, jnp.int32(0), hrow)
        H = H.at[0].set(hrow)
        e1row = jnp.where(row_idx == 0, -inp.oe1, E1[0])
        E1 = E1.at[0].set(jnp.where(hi_mask & (row_idx > 0), inf, e1row))
        f1row = jnp.where(in_de & (row_idx >= 1), f1, F1[0])
        f1row = jnp.where(row_idx == 0, inf, f1row)
        F1 = F1.at[0].set(f1row)
    else:
        f1 = -inp.o1 - inp.e1 * row_idx
        f2 = -inp.o2 - inp.e2 * row_idx
        hrow = jnp.where(in_de & (row_idx >= 1), jnp.maximum(f1, f2), filled)
        hrow = jnp.where(row_idx == 0, jnp.int32(0), hrow)
        H = H.at[0].set(hrow)
        e1row = jnp.where(hi_mask, inf, E1[0])
        e2row = jnp.where(hi_mask, inf, E2[0])
        e1row = jnp.where(row_idx == 0, -inp.oe1, e1row)
        e2row = jnp.where(row_idx == 0, -inp.oe2, e2row)
        E1 = E1.at[0].set(e1row)
        E2 = E2.at[0].set(e2row)
        f1row = jnp.where(in_de & (row_idx >= 1), f1, F1[0])
        f2row = jnp.where(in_de & (row_idx >= 1), f2, F2[0])
        f1row = jnp.where(row_idx == 0, inf, f1row)
        f2row = jnp.where(row_idx == 0, inf, f2row)
        F1 = F1.at[0].set(f1row)
        F2 = F2.at[0].set(f2row)
    return (H, E1, E2, F1, F2), (dp_beg, dp_end, dp_beg_sn, dp_end_sn,
                                 mpl, mpr)


@partial(jax.jit, static_argnums=0)
def banded_poa_dp(cfg: DPConfig, inp: DPInputs) -> DPOutputs:
    """One instance: align inp's query to its DAG. See module docstring."""
    pn = cfg.pn
    gm = cfg.gap_mode
    local = cfg.align_mode == LOCAL_MODE
    iota = jnp.arange(cfg.W, dtype=jnp.int32)
    seg = iota // pn
    inf = inp.inf_min
    dp_sn = inp.qlen // pn + 1

    # query profile qp[k][j] = mat[k, query[j-1]] (ref abpoa_init_var
    # :502-515), built once as a one-hot matmul (gathers serialize on TPU);
    # cols 0 and > qlen score 0
    qvalid = (iota >= 1) & (iota <= inp.qlen)
    m = inp.mat.shape[0]
    onehot = (inp.qcol[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None])
    qp = jnp.where(qvalid[None, :],
                   jnp.dot(inp.mat, onehot.astype(jnp.int32),
                           preferred_element_type=jnp.int32), 0)  # [m, W]

    zeros_plane = jnp.zeros((cfg.R, cfg.W), dtype=jnp.int32)
    planes = (zeros_plane, zeros_plane, zeros_plane, zeros_plane, zeros_plane)
    zi = jnp.zeros(cfg.R, dtype=jnp.int32)
    state = (zi, zi, zi, zi, inp.mpl.astype(jnp.int32),
             inp.mpr.astype(jnp.int32))
    planes, state = _first_row(cfg, inp, iota, seg, planes, state)
    H, E1, E2, F1, F2 = planes
    dp_beg, dp_end, dp_beg_sn, dp_end_sn, mpl, mpr = state

    best = (inf, jnp.int32(0), jnp.int32(0), inp.remain[0])
    carry = (H, E1, E2, F1, F2, dp_beg, dp_end, dp_beg_sn, dp_end_sn,
             mpl, mpr, best, jnp.bool_(False), jnp.int32(0))

    def body(t, carry):
        (H, E1, E2, F1, F2, dp_beg, dp_end, dp_beg_sn, dp_end_sn,
         mpl, mpr, best, stopped, n_cells) = carry
        t = jnp.int32(t)
        active = (t <= inp.n_rows - 2) & ~stopped
        base = inp.bases[t]
        qrow = jax.lax.dynamic_index_in_dim(qp, base, 0, keepdims=False)

        # --- band + snapping (ref :1305-1318) ---
        if cfg.banded:
            beg, end = _ad_bounds(cfg, inp, mpl[t], mpr[t], inp.remain[t])
            beg_sn = beg // pn
            p_ids = jnp.arange(cfg.P, dtype=jnp.int32)
            pvalid = p_ids < inp.pre_n[t]
            pbs = jnp.where(pvalid, dp_beg_sn[inp.pre_idx[t]],
                            jnp.int32(1 << 30))
            pes = jnp.where(pvalid, dp_end_sn[inp.pre_idx[t]], jnp.int32(-1))
            min_pre_beg_sn = jnp.min(pbs)
            max_pre_end_sn = jnp.max(pes)
            beg_sn = jnp.maximum(beg_sn, min_pre_beg_sn)
            end_sn = end // pn
            row_beg = beg_sn * pn
            row_end = (end_sn + 1) * pn - 1
        else:
            beg_sn = jnp.int32(0)
            end_sn = inp.qlen // pn
            row_beg = jnp.int32(0)
            row_end = inp.qlen
        dp_beg_sn = dp_beg_sn.at[t].set(jnp.where(active, beg_sn,
                                                  dp_beg_sn[t]))
        dp_end_sn = dp_end_sn.at[t].set(jnp.where(active, end_sn,
                                                  dp_end_sn[t]))
        dp_beg = dp_beg.at[t].set(jnp.where(active, row_beg, dp_beg[t]))
        dp_end = dp_end.at[t].set(jnp.where(active, row_end, dp_end[t]))

        h, e1v, e2v = _merge_preds(cfg, inp, iota, seg, (H, E1, E2),
                                   dp_beg_sn, dp_end_sn, dp_beg, dp_end,
                                   inp.pre_idx[t], inp.pre_n[t],
                                   beg_sn, end_sn, dp_sn, qrow, inf)
        band = (seg >= beg_sn) & (seg <= end_sn)
        lo = beg_sn * pn

        if gm == LINEAR_GAP:
            hfin = _h_scan_lg(iota, band, h, lo, inp.e1, inf)
            if local:
                hfin = jnp.maximum(hfin, 0)
            hrow = jnp.where(band, hfin, h)
            e1row, e2row, f1row, f2row = None, None, None, None
        elif gm == AFFINE_GAP:
            h0 = h + jnp.where(band, qrow, 0)
            seed = jnp.take(h0, lo)
            f1 = _f_scan(iota, band, h0, lo, inp.e1, inp.oe1, seed, inf)
            h1 = jnp.maximum(h0, e1v)
            hh = jnp.maximum(h1, f1)
            if local:
                hh = jnp.maximum(hh, 0)
            e1n = jnp.maximum(e1v - inp.e1, hh - inp.oe1)
            e1fin = jnp.where(hh == h1, e1n,
                              jnp.int32(0) if local else inf)
            hrow = jnp.where(band, hh, h0)
            e1row = jnp.where(band, e1fin, e1v)
            f1row = jnp.where(band, f1, jnp.int32(0))
            e2row, f2row = None, None
        else:  # convex
            h0 = h + jnp.where(band, qrow, 0)
            seed = jnp.take(h0, lo)
            hpf = jnp.maximum(jnp.maximum(h0, e1v), e2v)
            f1 = _f_scan(iota, band, hpf, lo, inp.e1, inp.oe1, seed, inf)
            f2 = _f_scan(iota, band, hpf, lo, inp.e2, inp.oe2, seed, inf)
            hh = jnp.maximum(jnp.maximum(hpf, f1), f2)
            if local:
                hh = jnp.maximum(hh, 0)
            e1n = jnp.maximum(e1v - inp.e1, hh - inp.oe1)
            e2n = jnp.maximum(e2v - inp.e2, hh - inp.oe2)
            if local:
                e1n = jnp.maximum(e1n, 0)
                e2n = jnp.maximum(e2n, 0)
            hrow = jnp.where(band, hh, h0)
            e1row = jnp.where(band, e1n, e1v)
            e2row = jnp.where(band, e2n, e2v)
            f1row = jnp.where(band, f1, jnp.int32(0))
            f2row = jnp.where(band, f2, jnp.int32(0))

        sel = lambda new, oldp: jnp.where(active, new, oldp[t])  # noqa: E731
        H = H.at[t].set(sel(hrow, H))
        if gm != LINEAR_GAP:
            E1 = E1.at[t].set(sel(e1row, E1))
            F1 = F1.at[t].set(sel(f1row, F1))
        if gm == CONVEX_GAP:
            E2 = E2.at[t].set(sel(e2row, E2))
            F2 = F2.at[t].set(sel(f2row, F2))
        n_cells = n_cells + jnp.where(active, (end_sn - beg_sn + 1) * pn, 0)

        # --- best tracking + adaptive band propagation (ref :1018-1067) ---
        bs, bi, bj, brem = best
        stop_now = jnp.bool_(False)
        mi = jnp.int32(-1)
        if cfg.align_mode in (LOCAL_MODE, EXTEND_MODE):
            mx, mi = _row_max(cfg, iota, seg, hrow, beg_sn, end_sn,
                              inp.qlen, inf)
            better = active & (mx > bs)
            if cfg.align_mode == EXTEND_MODE and cfg.use_zdrop:
                delta = brem - inp.remain[t]
                zlim = inp.zdrop + inp.e1 * jnp.abs(delta - (mi - bj))
                stop_now = active & ~better & (bs - mx > zlim)
            bs = jnp.where(better, mx, bs)
            bi = jnp.where(better, t, bi)
            bj = jnp.where(better, mi, bj)
            brem = jnp.where(better, inp.remain[t], brem)
        if cfg.banded:
            if cfg.align_mode == GLOBAL_MODE:
                _, mi = _row_max(cfg, iota, seg, hrow, beg_sn, end_sn,
                                 inp.qlen, inf)
            mpl, mpr = _scatter_minmax(cfg, mpl, mpr, inp.out_idx[t],
                                       inp.out_n[t], mi + 1,
                                       active & ~stop_now)
        stopped = stopped | stop_now
        best = (bs, bi, bj, brem)
        return (H, E1, E2, F1, F2, dp_beg, dp_end, dp_beg_sn, dp_end_sn,
                mpl, mpr, best, stopped, n_cells)

    carry = jax.lax.fori_loop(1, cfg.R - 1, body, carry)
    (H, E1, E2, F1, F2, dp_beg, dp_end, dp_beg_sn, dp_end_sn,
     mpl, mpr, best, stopped, n_cells) = carry
    bs, bi, bj, _ = best

    if cfg.align_mode == GLOBAL_MODE:
        # best over sink predecessors at column min(qlen, dp_end)
        # (ref :1284-1300); preds visited in in_id order, strict greater
        sink = inp.n_rows - 1
        for p in range(cfg.P):
            pv = p < inp.pre_n[sink]
            pred = inp.pre_idx[sink, p]
            endc = jnp.minimum(inp.qlen, dp_end[pred])
            v = jax.lax.dynamic_index_in_dim(H, pred, 0, keepdims=False)
            v = jnp.take(v, endc)
            better = pv & (v > bs)
            bs = jnp.where(better, v, bs)
            bi = jnp.where(better, pred, bi)
            bj = jnp.where(better, endc, bj)

    return DPOutputs(H, E1, E2, F1, F2, dp_beg, dp_end, bs, bi, bj,
                     mpl, mpr, n_cells)


@partial(jax.jit, static_argnums=0)
def banded_poa_dp_batch(cfg: DPConfig, inp: DPInputs) -> DPOutputs:
    """Batch of instances: every DPInputs leaf gains a leading batch axis."""
    return jax.vmap(lambda x: banded_poa_dp(cfg, x))(inp)
