"""Device-resident POA loop (ops/poa_loop.py) vs the host oracle.

Round-by-round bit-parity on CPU (interpret-mode kernels): after every
round the device graph state (adjacency CSR incl. list orders and edge
weights — all byte-parity-critical), the Kahn topo order, the remain
values, the re-exported DP planes and the backtrack cigar must all equal
the host oracle path's. This is the engine-equivalence gate for the
single-dispatch loop (ref semantics: src/abpoa_graph.c:186-274,596-672).
"""
import numpy as np
import pytest

from conftest import DATA

from abpoa_tpu.params import Params, SRC_NODE_ID, SINK_NODE_ID


def _reads(fn, n):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs][:n]


def _mk_cfg(params, maxlen, B, NR, R):
    from abpoa_tpu.align.engine_np import score_width_dispatch
    from abpoa_tpu.align.engine_jax import pick_WB
    from abpoa_tpu.ops.poa_loop import LoopConfig
    bits, pn, _ln, inf_min = score_width_dispatch(params, R, maxlen)
    assert bits == 16
    WB = pick_WB(params, maxlen, pn)
    Wq = ((maxlen // 128) + 1) * 128
    Wq = (Wq + WB - 1) // WB * WB
    LS = (R + Wq + 63) // 64 * 64
    return LoopConfig(R=R, E=12, P=8, A=4, Wq=Wq, WB=WB, LS=LS, NR=NR,
                      B=B, G=1, GT=B, pn=pn, inf_min=inf_min,
                      gap_mode=params.gap_mode,
                      use_zdrop=params.zdrop > 0)


def _csr_equal(st_np, g, b):
    c = g.build_csr()
    n = c["n"]
    assert st_np.node_n[b] == n
    assert (st_np.bases[b, :n] == c["bases"][:n]).all()
    for name, flat, off, dn, di, dw in (
            ("out", c["out_flat"], c["out_off"], st_np.n_out,
             st_np.out_ids, st_np.out_w),
            ("in", c["in_flat"], c["in_off"], st_np.n_in, st_np.in_ids,
             None),
            ("al", c["al_flat"], c["al_off"], st_np.n_al, st_np.al_ids,
             None)):
        cnt = off[1:] - off[:-1]
        assert (dn[b, :n] == cnt[:n]).all(), name
        for i in range(n):
            assert (di[b, i, :cnt[i]] == flat[off[i]:off[i + 1]]).all(), \
                (name, i)
            if dw is not None:
                assert (dw[b, i, :cnt[i]]
                        == c["out_w_flat"][off[i]:off[i + 1]]).all(), \
                    ("w", i)


# full sweep (all 9 seq.fa reads x both gap modes) is the fuzz/campaign
# variant: ABPOA_SLOW_TESTS=1 widens the default 3-read slice
import os
N_DL = 9 if os.environ.get("ABPOA_SLOW_TESTS") else 3
NK_DL = 4 if os.environ.get("ABPOA_SLOW_TESTS") else 3


@pytest.mark.parametrize("gaps", [None, (4, 2, 0, 0)],
                         ids=["convex", "affine"])
def test_device_loop_rounds_vs_oracle(gaps):
    import jax
    import jax.numpy as jnp
    from abpoa_tpu.graph import POAGraph
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    from abpoa_tpu.ops import dp_pallas as dpp
    from abpoa_tpu.ops import bt_xla
    from abpoa_tpu.ops import poa_loop as pls

    params = Params()
    if gaps is not None:
        (params.gap_open1, params.gap_ext1,
         params.gap_open2, params.gap_ext2) = gaps
    params.post_set()
    reads = _reads("seq.fa", N_DL)
    maxlen = max(len(q) for q in reads)
    B = 2
    cfg = _mk_cfg(params, maxlen, B, len(reads) - 1, 192)

    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    g.topological_sort(params)
    st, i2n, n2i, remain = pls.init_state_np([g, g], cfg)
    assert not st.fail.any()
    st = jax.tree.map(jnp.asarray, st)
    i2n, n2i, remain = map(jnp.asarray, (i2n, n2i, remain))
    scal_base = jnp.asarray(pls.make_scal_base(params, cfg))
    wf1000 = jnp.int32(round(params.wf * 1000))

    for r, q in enumerate(reads[1:], start=1):
        qlen = len(q)
        qc = np.zeros((B, cfg.Wq), np.int8)
        qc[:, 1:qlen + 1] = q
        st2, i2n2, n2i2, remain2, misc, s16 = pls.device_round(
            cfg, st, i2n, n2i, remain, jnp.asarray(qc),
            jnp.full(B, qlen, jnp.int32), scal_base,
            jnp.int32(params.wb), wf1000, interpret=True)
        if not g.is_topological_sorted:
            g.topological_sort(params)
        res = align_sequence_to_subgraph(g, params, SRC_NODE_ID,
                                         SINK_NODE_ID, q)
        mi = np.asarray(misc)
        assert mi[0, dpp.M_OVFL] == 0 and mi[0, dpp.M_FAIL] == 0
        assert mi[0, dpp.M_BEST] == res.best_score
        nst = int(mi[0, dpp.M_NSTEPS])
        steps32 = bt_xla.unpack_steps16(np.asarray(s16)[0], nst,
                                        int(mi[0, dpp.M_BI]),
                                        int(mi[0, dpp.M_BJ]))
        r2 = type(res)()
        bt_xla.replay_steps(g, params, q, steps32, nst,
                            int(mi[0, dpp.M_BI]), int(mi[0, dpp.M_BJ]),
                            int(mi[0, dpp.M_ENDI]),
                            int(mi[0, dpp.M_ENDJ]), r2)
        assert r2.cigar == res.cigar
        g.add_graph_alignment(params, q, [1] * qlen, res.cigar, None,
                              r, True)
        st_np = jax.tree.map(np.asarray, st2)
        assert not st_np.fail.any()
        for b in range(B):
            _csr_equal(st_np, g, b)
        g.topological_sort(params)
        nh = g.node_n
        for b in range(B):
            assert (np.asarray(i2n2)[b][:nh]
                    == np.asarray(g.index_to_node_id[:nh])).all()
            assert (np.asarray(n2i2)[b][:nh]
                    == np.asarray(g.node_id_to_index[:nh])).all()
            assert (np.asarray(remain2)[b][:nh]
                    == np.asarray(g.node_id_to_max_remain[:nh])).all()
        st, i2n, n2i, remain = st2, i2n2, n2i2, remain2


def test_fuse_topo_remain_no_kernel():
    """Fusion/topo/remain parity WITHOUT the DP kernel (fast): drive the
    device graph ops with step streams derived from the ORACLE's planes
    via the XLA backtracker, heter.fa scale (real mismatch bundles)."""
    import jax
    import jax.numpy as jnp
    from abpoa_tpu.graph import POAGraph
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    from abpoa_tpu.ops import dp_pallas as dpp
    from abpoa_tpu.ops import poa_loop as pls
    from abpoa_tpu.cigar import CMATCH, CINS, CDEL

    params = Params().post_set()
    reads = _reads("heter.fa", NK_DL)
    maxlen = max(len(q) for q in reads)
    B = 1
    cfg = _mk_cfg(params, maxlen, B, len(reads) - 1, 1024)

    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    g.topological_sort(params)
    st, i2n, n2i, remain = pls.init_state_np([g], cfg)
    st = jax.tree.map(jnp.asarray, st)
    i2n, n2i, remain = map(jnp.asarray, (i2n, n2i, remain))

    for r, q in enumerate(reads[1:], start=1):
        qlen = len(q)
        if not g.is_topological_sorted:
            g.topological_sort(params)
        res = align_sequence_to_subgraph(g, params, SRC_NODE_ID,
                                         SINK_NODE_ID, q)
        # oracle cigar -> packed step stream (reverse push order), the
        # exact inverse of bt_xla.replay_steps
        fwd = []          # (op_code, row, col) in forward order
        n2i_np = np.asarray(g.node_id_to_index)
        j = 0
        lead = trail = 0
        prev_row = 0
        ent = list(res.cigar)
        if ent and ent[0][0] == CINS and ent[0][1] == ent[0][2] - 1:
            lead = ent[0][2]
            j = lead
            ent = ent[1:]
        for e in ent:
            if e[0] == CMATCH:
                j += 1
                prev_row = int(n2i_np[e[1]])
                fwd.append((0, prev_row, j))
            elif e[0] == CDEL:
                prev_row = int(n2i_np[e[1]])
                fwd.append((2, prev_row, j))
            elif e[0] == CINS:
                # the row is unused for I fusion, but the wire encoding
                # is a delta stream: carry the walk's current row (the
                # previous M/D row) so deltas stay non-negative, exactly
                # as the real walker emits
                for _ in range(e[2]):
                    j += 1
                    fwd.append((1, prev_row, j))
        # trailing insertions belong to best_j < qlen
        while fwd and fwd[-1][0] == 1:
            trail += 1
            fwd.pop()
        nst = len(fwd)
        steps = np.zeros((B, cfg.LS), np.int32)
        for k, (op, row, col) in enumerate(reversed(fwd)):
            # I-steps carry the column but row stays at the walk's row:
            # reuse the next M/D row (row value is unused for I fusion)
            steps[0, k] = op | (row << 2) | (col << 14)
        misc = np.zeros((B, dpp.M_NMISC), np.int32)
        bj = qlen - trail
        misc[0, dpp.M_NSTEPS] = nst
        misc[0, dpp.M_BJ] = bj
        misc[0, dpp.M_ENDJ] = lead
        qc = np.zeros((B, cfg.Wq), np.int8)
        qc[0, 1:qlen + 1] = q
        st2 = pls.fuse_batch(cfg, st, i2n, jnp.asarray(steps),
                             jnp.asarray(misc), jnp.asarray(qc),
                             jnp.full(B, qlen, jnp.int32))
        i2n2, n2i2, ok = pls.topo_batch(cfg, st2, interpret=True)
        remain2 = pls.remain_batch(cfg, st2)
        # second implementation: the merged scalar-SMEM graph kernel
        # must produce the identical state and order
        st_k, i2n_k, n2i_k = pls.graph_update_batch(
            cfg, st, i2n, jnp.asarray(steps), jnp.asarray(misc),
            jnp.asarray(qc), jnp.full(B, qlen, jnp.int32),
            interpret=True)
        sx = jax.tree.map(np.asarray, st2)
        sk = jax.tree.map(np.asarray, st_k)
        nh0 = int(sx.node_n[0])
        assert not sk.fail.any()
        assert (sk.node_n == sx.node_n).all()
        assert (sk.bases[:, :nh0] == sx.bases[:, :nh0]).all()
        for f, cnt in (("out_ids", sx.n_out), ("out_w", sx.n_out),
                       ("in_ids", sx.n_in), ("al_ids", sx.n_al)):
            a, bb = getattr(sx, f), getattr(sk, f)
            m = (np.arange(a.shape[2])[None, None, :]
                 < cnt[:, :nh0, None])
            assert (np.where(m, a[:, :nh0], 0)
                    == np.where(m, bb[:, :nh0], 0)).all(), f
        assert (np.asarray(i2n_k)[:, :nh0]
                == np.asarray(i2n2)[:, :nh0]).all()
        assert (np.asarray(n2i_k)[:, :nh0]
                == np.asarray(n2i2)[:, :nh0]).all()
        g.add_graph_alignment(params, q, [1] * qlen, res.cigar, None,
                              r, True)
        st_np = jax.tree.map(np.asarray, st2)
        assert not st_np.fail.any()
        _csr_equal(st_np, g, 0)
        g.topological_sort(params)
        nh = g.node_n
        assert np.asarray(ok)[0] == 1
        assert (np.asarray(i2n2)[0][:nh]
                == np.asarray(g.index_to_node_id[:nh])).all()
        assert (np.asarray(remain2)[0][:nh]
                == np.asarray(g.node_id_to_max_remain[:nh])).all()
        st, i2n, n2i, remain = st2, i2n2, n2i2, remain2
