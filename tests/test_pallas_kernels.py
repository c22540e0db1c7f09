"""Interpret-mode parity of the Pallas device kernels vs the oracle.

Covers the flagship device path on CPU (no TPU needed): the v2 full-width
kernel (ops/dp_pallas_fw.py) and the v4 mod-WB banded kernel
(ops/dp_pallas_band.py) must produce identical misc/steps/band state to
each other and the oracle's best score on real fixture graphs.
"""
import numpy as np
import pytest

from conftest import DATA

from abpoa_tpu.params import Params, SRC_NODE_ID, SINK_NODE_ID
from abpoa_tpu.graph import POAGraph


def _reads(fn, n):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs][:n]


def _run_kernels(fixture, n_reads, params):
    """Yield (fw_out, band_out, oracle_res, n_rows) per aligned read."""
    import jax.numpy as jnp
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    from abpoa_tpu.align.engine_jax import (export_dense,
                                            make_pallas_inputs, pick_WB)
    from abpoa_tpu.ops.dp_pallas_fw import FWConfig, fw_poa_dp_batch
    from abpoa_tpu.ops.dp_pallas_band import (BandConfig,
                                              band_poa_dp_batch)
    reads = _reads(fixture, n_reads)
    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    for rid, q in enumerate(reads[1:], start=1):
        if not g.is_topological_sorted:
            g.topological_sort(params)
        dg = export_dense(g, params, q)
        WB = pick_WB(params, dg.qlen, dg.pn)
        Wq = (dg.qlen // 128 + 1) * 128
        LMAX = ((dg.R + Wq) + 511) // 512 * 512
        WqB = (Wq + WB - 1) // WB * WB
        cfgF, arrsF = make_pallas_inputs(dg, params, WB, force_Wq=Wq,
                                         bt_lmax=LMAX)
        cfgB, arrsB = make_pallas_inputs(dg, params, WB, force_Wq=WqB,
                                         bt_lmax=LMAX)
        fwc = FWConfig(cfgF.gap_mode, cfgF.align_mode, cfgF.pn, dg.R, Wq,
                       cfgF.P, cfgF.O, cfgF.m, cfgF.use_zdrop, LMAX, 1)
        bc = BandConfig(cfgB.gap_mode, cfgB.align_mode, cfgB.pn, dg.R,
                        WB, WqB, cfgB.P, cfgB.O, cfgB.m, cfgB.use_zdrop,
                        LMAX, 1)
        outF = fw_poa_dp_batch(
            fwc, *[jnp.asarray(a)[None] for a in arrsF], interpret=True)
        outB = band_poa_dp_batch(
            bc, *[jnp.asarray(a)[None] for a in arrsB], interpret=True)
        res = align_sequence_to_subgraph(g, params, SRC_NODE_ID,
                                         SINK_NODE_ID, q)
        yield outF, outB, res, dg.n_rows
        g.add_graph_alignment(params, q, [1] * len(q), res.cigar, None,
                              rid, True)


@pytest.mark.parametrize("fixture,n_reads,mode,gaps", [
    ("seq.fa", 5, "global", None),
    ("seq.fa", 4, "extend", None),
    ("seq.fa", 4, "global", (4, 2, 0, 0)),   # affine
    ("seq.fa", 4, "global", (0, 2, 0, 0)),   # linear
])
def test_fw_band_oracle_parity(fixture, n_reads, mode, gaps):
    from abpoa_tpu.ops import dp_pallas as dpp
    from abpoa_tpu.params import EXTEND_MODE
    params = Params()
    if mode == "extend":
        params.align_mode = EXTEND_MODE
    if gaps is not None:
        (params.gap_open1, params.gap_ext1,
         params.gap_open2, params.gap_ext2) = gaps
    params.post_set()
    for outF, outB, res, n in _run_kernels(fixture, n_reads, params):
        mF = np.asarray(outF.misc)[0]
        mB = np.asarray(outB.misc)[0]
        assert (mF == mB).all()
        assert int(mB[dpp.M_BEST]) == res.best_score
        assert not mB[dpp.M_OVFL] and not mB[dpp.M_FAIL]
        ns = int(mB[dpp.M_NSTEPS])
        assert (np.asarray(outF.steps)[0][:ns]
                == np.asarray(outB.steps)[0][:ns]).all()
        # band state parity within the valid rows (padding rows beyond
        # n_rows are never read by the host)
        for f in ("beg_sn", "end_sn", "mpl", "mpr"):
            assert (np.asarray(getattr(outF, f))[0][:n]
                    == np.asarray(getattr(outB, f))[0][:n]).all(), f


def test_band_kernel_g2_packing():
    """G=2 sublane packing: two different instances in one program must
    match two G=1 runs exactly."""
    import jax.numpy as jnp
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    from abpoa_tpu.align.engine_jax import (export_dense,
                                            make_pallas_inputs, pick_WB,
                                            repad_dense)
    from abpoa_tpu.ops.dp_pallas_band import (BandConfig,
                                              band_poa_dp_batch)
    from abpoa_tpu.ops import dp_pallas as dpp
    params = Params().post_set()
    reads = _reads("seq.fa", 4)
    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    g.topological_sort(params)
    res = align_sequence_to_subgraph(g, params, SRC_NODE_ID, SINK_NODE_ID,
                                     reads[1])
    g.add_graph_alignment(params, reads[1], [1] * len(reads[1]),
                          res.cigar, None, 1, True)
    g.topological_sort(params)
    dgs = [export_dense(g, params, reads[2]),
           export_dense(g, params, reads[3])]
    R = max(d.R for d in dgs)
    W = max(d.W for d in dgs)
    P = max(d.P for d in dgs)
    O = max(d.O for d in dgs)
    dgs = [repad_dense(d, R, W, P, O) for d in dgs]
    WB = max(pick_WB(params, d.qlen, d.pn) for d in dgs)
    Wq = max((d.qlen // 128 + 1) * 128 for d in dgs)
    WqB = (Wq + WB - 1) // WB * WB
    LMAX = ((R + Wq) + 511) // 512 * 512
    cfgs, arrs = zip(*(make_pallas_inputs(d, params, WB, force_Wq=WqB,
                                          bt_lmax=LMAX) for d in dgs))
    bc = BandConfig(cfgs[0].gap_mode, cfgs[0].align_mode, cfgs[0].pn, R,
                    WB, WqB, cfgs[0].P, cfgs[0].O, cfgs[0].m,
                    cfgs[0].use_zdrop, LMAX, 2)
    stacked = tuple(jnp.asarray(np.stack([a[i] for a in arrs]))
                    for i in range(len(arrs[0])))
    out2 = band_poa_dp_batch(bc, *stacked, interpret=True)
    bc1 = bc._replace(G=1)
    for b in range(2):
        one = tuple(jnp.asarray(x)[None] for x in arrs[b])
        out1 = band_poa_dp_batch(bc1, *one, interpret=True)
        assert (np.asarray(out1.misc)[0]
                == np.asarray(out2.misc)[b]).all()
        ns = int(np.asarray(out2.misc)[b][dpp.M_NSTEPS])
        assert (np.asarray(out1.steps)[0][:ns]
                == np.asarray(out2.steps)[b][:ns]).all()


@pytest.mark.parametrize("mode,wb", [("local", -1), ("global", -1),
                                     ("extend", -1)])
def test_fw_kernel_modes_vs_oracle(mode, wb):
    """Local / unbanded-global / extend through the fw kernel (interpret
    mode) must reproduce the oracle's score AND cigar exactly."""
    import jax.numpy as jnp
    from abpoa_tpu.params import LOCAL_MODE, EXTEND_MODE
    from abpoa_tpu.align.engine_np import (AlignResult,
                                           align_sequence_to_subgraph)
    from abpoa_tpu.align.engine_jax import export_dense, make_pallas_inputs
    from abpoa_tpu.ops.dp_pallas_fw import FWConfig, fw_poa_dp_batch
    from abpoa_tpu.ops import dp_pallas as dpp
    from abpoa_tpu.ops import bt_xla
    params = Params()
    if mode == "local":
        params.align_mode = LOCAL_MODE
    elif mode == "extend":
        params.align_mode = EXTEND_MODE
    params.wb = wb
    params.post_set()
    reads = _reads("seq.fa", 5)
    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    for rid, q in enumerate(reads[1:], start=1):
        if not g.is_topological_sorted:
            g.topological_sort(params)
        dg = export_dense(g, params, q)
        Wq = (dg.qlen // 128 + 1) * 128
        LMAX = ((dg.R + Wq) + 511) // 512 * 512
        cfgF, arrs = make_pallas_inputs(dg, params, 128, force_Wq=Wq,
                                        bt_lmax=LMAX)
        fwc = FWConfig(cfgF.gap_mode, cfgF.align_mode, cfgF.pn, dg.R, Wq,
                       cfgF.P, cfgF.O, cfgF.m, cfgF.use_zdrop, LMAX, 1,
                       banded=False)
        out = fw_poa_dp_batch(fwc, *[jnp.asarray(a)[None] for a in arrs],
                              interpret=True)
        m = np.asarray(out.misc)[0]
        res = align_sequence_to_subgraph(g, params, SRC_NODE_ID,
                                         SINK_NODE_ID, q)
        dres = AlignResult()
        dres.best_score = int(m[dpp.M_BEST])
        bt_xla.replay_steps(g, params, np.asarray(q),
                            np.asarray(out.steps)[0],
                            int(m[dpp.M_NSTEPS]), int(m[dpp.M_BI]),
                            int(m[dpp.M_BJ]), int(m[dpp.M_ENDI]),
                            int(m[dpp.M_ENDJ]), dres)
        assert not m[dpp.M_FAIL]
        assert dres.best_score == res.best_score
        assert dres.cigar == res.cigar
        g.add_graph_alignment(params, q, [1] * len(q), res.cigar, None,
                              rid, True)


def test_pre_delta_encoding():
    """uint8 delta pre_idx (parallel/batch._pre_deltas): the band kernel
    must reconstruct identical predecessors, and deltas that overflow a
    byte must keep the absolute int16 stream."""
    import jax.numpy as jnp
    from abpoa_tpu.parallel.batch import _pre_deltas
    from abpoa_tpu.align.engine_jax import (export_dense,
                                            make_pallas_inputs, pick_WB)
    from abpoa_tpu.ops.dp_pallas_band import (BandConfig,
                                              band_poa_dp_batch)
    from abpoa_tpu.ops import dp_pallas as dpp
    params = Params().post_set()
    reads = _reads("seq.fa", 3)
    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    g.topological_sort(params)
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    res = align_sequence_to_subgraph(g, params, SRC_NODE_ID, SINK_NODE_ID,
                                     reads[1])
    g.add_graph_alignment(params, reads[1], [1] * len(reads[1]),
                          res.cigar, None, 1, True)
    g.topological_sort(params)
    dg = export_dense(g, params, reads[2])
    WB = pick_WB(params, dg.qlen, dg.pn)
    Wq = (dg.qlen // 128 + 1) * 128
    WqB = (Wq + WB - 1) // WB * WB
    LMAX = (dg.R + Wq + 63) // 64 * 64
    cfg, arrs = make_pallas_inputs(dg, params, WB, force_Wq=WqB,
                                   bt_lmax=LMAX)
    bc = BandConfig(cfg.gap_mode, cfg.align_mode, cfg.pn, dg.R, WB, WqB,
                    cfg.P, cfg.O, cfg.m, cfg.use_zdrop, LMAX, 1)
    stacked = [np.stack([a]) for a in arrs]
    enc = _pre_deltas([a.copy() for a in stacked], dg.R, cfg.P)
    assert enc[2].dtype == np.uint8   # all deltas fit a byte
    out_abs = band_poa_dp_batch(
        bc, *[jnp.asarray(a) for a in stacked], interpret=True)
    out_del = band_poa_dp_batch(
        bc, *[jnp.asarray(a) for a in enc], interpret=True)
    assert (np.asarray(out_abs.misc) == np.asarray(out_del.misc)).all()
    ns = int(np.asarray(out_abs.misc)[0][dpp.M_NSTEPS])
    assert (np.asarray(out_abs.steps)[0][:ns]
            == np.asarray(out_del.steps)[0][:ns]).all()
    # overflow: a predecessor further than 255 rows keeps the absolute
    # int16 stream (synthetic: the fixtures are too small to produce one)
    R2, P2 = 512, 2
    pre = np.tile(np.arange(R2, dtype=np.int16)[:, None] - 1,
                  (1, P2)).clip(min=0)
    pre[400, 0] = 100   # delta 300
    pn2 = np.ones((1, R2), np.int8)
    big = [None, None, pre.reshape(1, R2 * P2), pn2]
    enc2 = _pre_deltas(big, R2, P2)
    assert enc2[2].dtype == np.int16


def test_band_cells_fresh_ignores_dummy_rowmask():
    """dp_cells accounting: plain (fresh=True) dispatches ship rowmask as
    a 1-element zeros dummy (parallel/batch.py dummy_out slot 10) — the
    count must treat it as all-ones. Regression: a dummy-gated mask
    zeroed dp_cells for every plain-path round, so bench.py's headline
    read value=0 / vs_baseline=0 despite correct consensus output."""
    from abpoa_tpu.ops.dp_pallas_band import BandConfig, band_cells
    from abpoa_tpu.ops.dp_pallas import S_NROWS, S_NSCAL
    B, R, pn = 2, 8, 2
    scal = np.zeros((B, S_NSCAL), np.int32)
    scal[0, S_NROWS] = 6
    scal[1, S_NROWS] = 8
    # every row spans snapshots [0, 2] -> 3 snapshots * pn cells/row
    bsn = np.full((B, R), 2 << 16, np.int32)
    cfg = BandConfig(0, 0, pn, R, 128, 128, 2, 2, 5, False, 64, 1,
                     fresh=True)
    dummy = np.zeros((B, 1), np.int8)
    got = np.asarray(band_cells(cfg, scal, bsn, dummy))
    # swept rows are 1..n_rows-2: 4 rows and 6 rows respectively
    assert got.tolist() == [4 * 3 * pn, 6 * 3 * pn]
    # subgraph (fresh=False) dispatches ship the real mask and it gates
    cfg2 = cfg._replace(fresh=False)
    rowmask = np.ones((B, R), np.int8)
    rowmask[0, 2] = 0
    got2 = np.asarray(band_cells(cfg2, scal, bsn, rowmask))
    assert got2.tolist() == [3 * 3 * pn, 6 * 3 * pn]
