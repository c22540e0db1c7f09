#!/bin/bash
# Regenerate golden outputs from the reference abPOA binary (built in .refbuild/).
# Usage: bash gen_goldens.sh <abpoa_bin> <test_data_dir> <out_dir>
set -e
BIN=${1:-/root/repo/.refbuild/bin/abpoa}
TD=${2:-/root/repo/.refbuild/test_data}
OUT=${3:-/root/repo/tests/golden}
cd "$OUT"
$BIN $TD/seq.fa > seq_cons.fa 2>/dev/null
$BIN $TD/seq.fa -r1 > seq_msa.out 2>/dev/null
$BIN $TD/seq.fa -r2 > seq_cons_msa.out 2>/dev/null
$BIN $TD/seq.fa -r3 > seq.gfa 2>/dev/null
$BIN $TD/seq.fa -r4 > seq_cons.gfa 2>/dev/null
$BIN $TD/seq.fa -r5 > seq_cons.fq 2>/dev/null
$BIN $TD/test.fa -r2 > test_cons_msa.out 2>/dev/null
$BIN $TD/heter.fa -d2 > heter_d2_cons.fa 2>/dev/null
$BIN $TD/heter.fa -d2 -r2 > heter_d2_cons_msa.out 2>/dev/null
$BIN $TD/heter.fa > heter_cons.fa 2>/dev/null
# linear / affine gap modes
$BIN $TD/seq.fa -O 0 > seq_cons_lin.fa 2>/dev/null
$BIN $TD/seq.fa -O 4,0 > seq_cons_aff.fa 2>/dev/null
# local / extend modes
$BIN $TD/seq.fa -m 1 > seq_cons_local.fa 2>/dev/null
$BIN $TD/seq.fa -m 2 > seq_cons_ext.fa 2>/dev/null
# incremental: align seq.fa onto its own GFA / MSA
$BIN -i seq.gfa $TD/seq.fa -r3 > seq_incr_gfa.gfa 2>/dev/null
$BIN -i seq_msa.out $TD/seq.fa -r1 > seq_incr_msa.out 2>/dev/null
# seeding + progressive on heter (global only)
$BIN $TD/heter.fa -S > heter_S_cons.fa 2>/dev/null
$BIN $TD/heter.fa -S -p > heter_Sp_cons.fa 2>/dev/null
$BIN $TD/heter.fa -S -n 100 > heter_S_n100_cons.fa 2>/dev/null
# no band
$BIN $TD/seq.fa -b -1 > seq_cons_noband.fa 2>/dev/null
# amb strand
$BIN $TD/seq.fa -s > seq_cons_ambs.fa 2>/dev/null
echo "goldens written to $OUT"
