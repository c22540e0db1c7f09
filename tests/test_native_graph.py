"""NativeGraph (C store) equivalence vs the pure-Python POAGraph oracle.

The native store must reproduce the Python store bit-for-bit: list orders,
fusion rules and traversal orders all determine output bytes (ref
/root/reference/src/abpoa_graph.c:186-676).
"""
import io
import contextlib

import numpy as np
import pytest

from conftest import DATA, GOLDEN_SAN

from abpoa_tpu.graph import POAGraph, NativeGraph
from abpoa_tpu.params import Params, SRC_NODE_ID, SINK_NODE_ID
from abpoa_tpu.cigar import CMATCH, CINS, CDEL

pytestmark = pytest.mark.skipif(not NativeGraph.available(),
                                reason="native library unavailable")


def _assert_nodes_equal(g1: POAGraph, g2: NativeGraph):
    assert g1.node_n == g2.node_n
    for a, b in zip(g1.node, g2.node):
        assert a.base == b.base
        assert a.in_id == b.in_id
        assert a.out_id == b.out_id
        assert a.out_weight == b.out_weight
        assert a.read_ids == b.read_ids
        assert a.aligned_node_id == b.aligned_node_id
        assert a.n_read == b.n_read
        assert a.read_weight == b.read_weight


def _fixture_reads(fn, n=None):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    reads = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
             for r in recs]
    return reads[:n] if n else reads


def test_fusion_equivalence_seq():
    """Oracle-aligned cigars fused into both stores -> identical graphs."""
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    p = Params().post_set()
    p.use_read_ids = True
    reads = _fixture_reads("seq.fa")
    g1, g2 = POAGraph(), NativeGraph()
    for rid, q in enumerate(reads):
        w = [1] * len(q)
        if g1.node_n > 2:
            if not g1.is_topological_sorted:
                g1.topological_sort(p)
            if not g2.is_topological_sorted:
                g2.topological_sort(p)
            res = align_sequence_to_subgraph(g1, p, SRC_NODE_ID,
                                             SINK_NODE_ID, q)
            cigar = res.cigar
        else:
            cigar = []
        g1.add_graph_alignment(p, q, w, cigar, None, rid, True)
        g2.add_graph_alignment(p, q, w, cigar, None, rid, True)
    _assert_nodes_equal(g1, g2)
    g1.topological_sort(p)
    g2.topological_sort(p)
    assert (g1.index_to_node_id == g2.index_to_node_id).all()
    assert (g1.node_id_to_max_remain == g2.node_id_to_max_remain).all()
    g1.set_msa_rank()
    g2.set_msa_rank()
    assert (g1.node_id_to_msa_rank == g2.node_id_to_msa_rank).all()


def _cigar_to_steps(g, cigar, qlen):
    """Inverse of bt_xla.replay_steps: forward cigar -> reversed packed
    step stream + (best_j, end_j) boundary insert lengths."""
    n2i = g.node_id_to_index
    ents = list(cigar)
    end_j = 0
    best_j = qlen
    if ents and ents[0][0] == CINS:
        end_j = ents[0][2]
        ents = ents[1:]
    if ents and ents[-1][0] == CINS:
        best_j -= ents[-1][2]
        ents = ents[:-1]
    steps = []
    qid = end_j  # query consumed so far (cols are 1-based query positions)
    for op, a, b in ents:
        if op == CMATCH:
            qid += 1
            steps.append(0 | int(n2i[a]) << 2 | qid << 14)
        elif op == CDEL:
            for _ in range(b):
                steps.append(2 | int(n2i[a]) << 2)
        elif op == CINS:
            for j in range(b):
                qid += 1
                steps.append(1 | qid << 14)
    steps.reverse()
    return np.asarray(steps, dtype=np.int32), best_j, end_j


def test_fuse_steps_matches_cigar_fusion():
    """pg_fuse_steps == replay_steps + add_graph_alignment."""
    from abpoa_tpu.align.engine_np import align_sequence_to_subgraph
    p = Params().post_set()
    p.use_read_ids = True
    reads = _fixture_reads("seq.fa")
    g1, g2 = POAGraph(), NativeGraph()
    for rid, q in enumerate(reads):
        w = [1] * len(q)
        if g1.node_n <= 2:
            g1.add_graph_alignment(p, q, w, [], None, rid, True)
            g2.add_graph_alignment(p, q, w, [], None, rid, True)
            continue
        if not g1.is_topological_sorted:
            g1.topological_sort(p)
        if not g2.is_topological_sorted:
            g2.topological_sort(p)
        res = align_sequence_to_subgraph(g1, p, SRC_NODE_ID, SINK_NODE_ID,
                                         q)
        steps, best_j, end_j = _cigar_to_steps(g1, res.cigar, len(q))
        g1.add_graph_alignment(p, q, w, res.cigar, None, rid, True)
        g2.fuse_steps(p, 0, steps, len(steps), best_j, end_j, q, rid, True)
    _assert_nodes_equal(g1, g2)


def test_read_id_word_growth():
    """read-id masks grow past 64/128 reads (multi-word re-layout)."""
    p = Params().post_set()
    g1, g2 = POAGraph(), NativeGraph()
    for g in (g1, g2):
        a = g.add_node(1)
        b = g.add_node(2)
        for rid in range(200):
            g.add_edge(a, b, True, 1, True, False, rid)
        g.add_edge(SRC_NODE_ID, a, True, 1, True, False, 0)
        g.add_edge(b, SINK_NODE_ID, True, 1, True, False, 0)
    _assert_nodes_equal(g1, g2)
    assert g2.node[2].read_ids[0] == (1 << 200) - 1


def test_pipeline_golden_parity_native():
    """End-to-end CLI outputs through the native store byte-match the
    sanitized reference goldens (consensus, MSA, GFA, multi-allele, qv)."""
    import abpoa_tpu.api as api
    from abpoa_tpu.cli import main
    orig = api.ABPOA.__init__

    def patched(self):
        orig(self)
        self.graph = NativeGraph()

    api.ABPOA.__init__ = patched
    try:
        cases = [
            (["tests/data/seq.fa"], "seq_cons.fa"),
            (["-r2", "tests/data/seq.fa"], "seq_cons_msa.out"),
            (["-r3", "tests/data/seq.fa"], "seq.gfa"),
            (["-d2", "-r2", "tests/data/heter.fa"],
             "heter_d2_cons_msa.out"),
            (["-Q", "-d2", "-r2", "tests/data/seq.fq"],
             "seq_fq_Qd2_msa.out"),
            (["-i", str(GOLDEN_SAN / "seq.gfa"), "-r3",
              "tests/data/seq.fa"], "seq_incr_gfa.gfa"),
        ]
        for args, golden in cases:
            args = [a.replace("tests/data/", str(DATA) + "/")
                    for a in args]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(io.StringIO()):
                rc = main(args)
            assert rc == 0
            assert buf.getvalue() == (GOLDEN_SAN / golden).read_text(), \
                golden
    finally:
        api.ABPOA.__init__ = orig


def test_batch_consensus_native(monkeypatch):
    """BatchPOA (device driver) with the native store matches the
    sequential golden consensus."""
    from abpoa_tpu.parallel import BatchPOA
    reads = _fixture_reads("seq.fa")
    bp = BatchPOA(Params().post_set(), engine="xla")
    cons = bp.run_consensus([reads] * 3)
    golden = (GOLDEN_SAN / "seq_cons.fa").read_text().splitlines()[1]
    assert all(c == [golden] for c in cons)
