"""Property tests (SURVEY §4: the reference has no test suite; these are
the invariants its code asserts implicitly)."""
import numpy as np
import pytest

from abpoa_tpu.api import ABPOA
from abpoa_tpu.params import Params
from abpoa_tpu import align as aln
from abpoa_tpu.alphabet import encode_seq, decode_table
from abpoa_tpu.consensus import generate_consensus
from abpoa_tpu.cigar import CMATCH, CINS, CDEL


def _cons(ab, params):
    generate_consensus(ab, params)
    tab = decode_table(params.m)
    return [bytes(tab[b] for b in s).decode()
            for s in ab.cons.cons_base[:ab.cons.n_cons]]


def test_single_read_consensus_is_read():
    params = Params().post_set()
    s = "ACGTTGCAACGTTGCA" * 4
    ab = ABPOA()
    ab.n_seq, ab.names, ab.is_rc = 1, [""], [0]
    ab.poa(params, [encode_seq(s)], [[1] * len(s)], 0)
    assert _cons(ab, params) == [s]


def test_identical_reads_consensus():
    params = Params().post_set()
    s = "TTGACCGGATCGATCGAAGGCC"
    ab = ABPOA()
    n = 5
    ab.n_seq, ab.names, ab.is_rc = n, [""] * n, [0] * n
    ab.poa(params, [encode_seq(s)] * n, [[1] * len(s)] * n, 0)
    assert _cons(ab, params) == [s]


def _cigar_score(graph, params, query, res):
    """Recompute the alignment score from the cigar (global mode)."""
    score = 0
    node_of = {}
    prev_j = None
    mat = params.mat
    i = 0
    for entry in res.cigar:
        op = entry[0]
        if op == CMATCH:
            nid, qid = entry[1], entry[2]
            score += int(mat[graph.node[nid].base][query[qid]])
        elif op == CINS:
            length = entry[2]
            score -= min(params.gap_open1 + length * params.gap_ext1,
                         params.gap_open2 + length * params.gap_ext2)
        elif op == CDEL:
            length = entry[2]
            score -= min(params.gap_open1 + length * params.gap_ext1,
                         params.gap_open2 + length * params.gap_ext2)
    return score


def test_score_matches_cigar_convex():
    """best_score == score recomputed from the returned cigar (runs of
    same-op deletions counted per entry, which the reference emits as
    length-1 CDEL entries — group them)."""
    rng = np.random.default_rng(7)
    bases = "ACGT"
    params = Params().post_set()
    ab = ABPOA()
    ab.n_seq, ab.names, ab.is_rc = 3, [""] * 3, [0] * 3
    ref = "".join(rng.choice(list(bases), 120))
    reads = [ref]
    for _ in range(2):
        q = list(ref)
        for _k in range(6):
            pos = int(rng.integers(1, len(q) - 1))
            r = rng.random()
            if r < 0.4:
                q[pos] = rng.choice(list(bases))
            elif r < 0.7:
                q.insert(pos, rng.choice(list(bases)))
            else:
                del q[pos]
        reads.append("".join(q))
    enc = [encode_seq(s) for s in reads]
    # build graph from read 0, then align reads 1-2 and check their scores
    ab.graph.add_graph_alignment(params, enc[0], [1] * len(enc[0]), [],
                                 None, 0, True)
    for i in (1, 2):
        res = aln.align_sequence_to_graph(ab.graph, params, enc[i],
                                          arena=ab.arena)
        # group consecutive CDEL entries into runs for convex scoring
        merged = []
        for e in res.cigar:
            if (e[0] == CDEL and merged and merged[-1][0] == CDEL):
                merged[-1] = (CDEL, e[1], merged[-1][2] + e[2])
            else:
                merged.append(e)
        res2 = type(res)()
        res2.cigar = merged
        got = _cigar_score(ab.graph, params, enc[i], res2)
        assert got == res.best_score, (got, res.best_score)
        ab.graph.add_graph_alignment(params, enc[i], [1] * len(enc[i]),
                                     res.cigar, None, i, True)


def test_gfa_roundtrip_preserves_consensus(tmp_path):
    """GFA out -> GFA in is a full graph serialization round trip
    (SURVEY §5 checkpoint/resume)."""
    import io
    from abpoa_tpu.cli import main
    import contextlib
    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        f.write(">a\nACGGTAGCCATT\n>b\nACGGTAGCATT\n>c\nACGGTAGGCCATT\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), \
            contextlib.redirect_stderr(io.StringIO()):
        main(["-r3", fa])
    gfa = tmp_path / "g.gfa"
    gfa.write_text(buf.getvalue())
    # restore and re-emit: graph survives the round trip
    buf2 = io.StringIO()
    empty = tmp_path / "empty.fa"
    empty.write_text(">x\nACGGTAGCCATT\n")
    with contextlib.redirect_stdout(buf2), \
            contextlib.redirect_stderr(io.StringIO()):
        main(["-i", str(gfa), "-r3", str(empty)])
    assert buf2.getvalue().startswith("H\t")
    assert buf2.getvalue().count("S\t") >= buf.getvalue().count("S\t")
