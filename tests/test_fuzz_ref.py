"""Differential fuzz subset: fixed seeds through tools/fuzz_ref.py,
byte-compared against the sanitized reference binary (CANARY_BYTE=0x00;
docs/REFERENCE_UB.md). The long campaign is `python tools/fuzz_ref.py
--n 500 --keep-going`; this keeps a representative slice in the suite.

Skips when the reference scaffolding (.refbuild, untracked) is absent.
"""
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import fuzz_ref  # noqa: E402

pytestmark = pytest.mark.skipif(
    not fuzz_ref.REF_BIN.exists(),
    reason="sanitized reference binary not built "
           "(tests/golden/make_sanitized_ref.sh)")

# seeds chosen to span modes: global/local/extend, linear/affine/convex,
# r0-r5, seeding, fastq+qv, aa, amb_strand, multi-consensus, incremental
# -i restore (38, 90: GFA + MSA) (the campaign prints each seed's
# config; see tools/fuzz_ref.py gen_case). 3212 is the arena-residue
# regression: narrow-band linear seeded windows whose backtrack
# dead-ended before per-call arena clearing (docs/REFERENCE_UB.md).
# 7887: failure-for-failure — the reference SIGABRTs in its chaining
# allocator on a pathological rc'd seeded read; our CLI must also exit
# nonzero (it does, with a clean one-line error)
SEEDS = [0, 2, 3, 6, 7, 10, 16, 19, 22, 23, 38, 90, 3212, 7887]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_parity(seed, tmp_path):
    ok, descr, ref, got, args, text = fuzz_ref.run_case(seed, tmp_path)
    assert ok, (f"seed {seed} ({descr}) args={' '.join(args)}\n"
                f"ref: {ref[:400]!r}\ngot: {got[:400]!r}")


def test_fuzz_list_mode(tmp_path):
    # -l case: per-file reference runs vs our list loop (defined
    # semantics; docs/REFERENCE_UB.md finding 3)
    ok, descr, ref, got, args, text = fuzz_ref.run_case(
        1, tmp_path, list_mode=True)
    assert ok, f"list seed 1 ({descr}): ref={ref[:300]!r} got={got[:300]!r}"
