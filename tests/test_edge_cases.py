"""Edge-case inputs: no crashes, reference-matching behavior.

N bases (code 4 scores 0 vs everything), lowercase, single reads, 1 bp
reads, length-mismatched pairs — outputs verified against the reference
binary where it is deterministic.
"""
import io
import contextlib

import pytest

from abpoa_tpu.cli import main


def run(tmp_path, content, args=()):
    fn = tmp_path / "in.fa"
    fn.write_text(content)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), \
            contextlib.redirect_stderr(io.StringIO()):
        rc = main([*args, str(fn)])
    assert rc == 0
    return buf.getvalue()


CASES = [
    ("", (), ""),
    (">a\nACGT\n", (), ">Consensus_sequence\nACGT\n"),
    (">a\nA\n>b\nA\n", (), ">Consensus_sequence\nA\n"),
    (">a\nACGNNNACGT\n>b\nACGNNACGT\n", (),
     ">Consensus_sequence\nACGNNNACGT\n"),
    (">a\nacgtacgt\n>b\nacgtcgt\n", (), ">Consensus_sequence\nACGTACGT\n"),
    (">a\nAC\n>b\nACGTACGTACGTACGT\n", (),
     ">Consensus_sequence\nACGTACGTACGTACGT\n"),
    (">a\nG\n>b\nG\n>c\nG\n", ("-r2",),
     ">a\nG\n>b\nG\n>c\nG\n>Consensus_sequence\nG\n"),
    (">a\nACGTACAAGT\n", ("-m", "1"),
     ">Consensus_sequence\nACGTACAAGT\n"),
]


@pytest.mark.parametrize("content,args,expected", CASES,
                         ids=[f"case{i}" for i in range(len(CASES))])
def test_edge_inputs(tmp_path, content, args, expected):
    assert run(tmp_path, content, args) == expected
