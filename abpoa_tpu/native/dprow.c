/* Oracle DP row kernels: C implementation of engine_np.py's per-row
 * hot path (band snap, predecessor merges, masked F scan, row max).
 *
 * The numpy oracle spends its time in numpy-call overhead on tiny
 * pn-lane segments; these kernels run the same semantics (bit-exact,
 * including int16/int32 wraparound — compiled with -fwrapv) as plain
 * scalar loops. engine_np dispatches here when the native library
 * loads (ABPOA_NO_NATIVE=1 forces the numpy path).
 *
 * prm (int64[16 + 2*log_n]):
 *   0 pn     1 log_n  2 dp_sn   3 qlen   4 width  5 row_stride(elems)
 *   6 local  7 wb<0   8 gap_mode(0 lg, 1 ag, 2 cg)
 *   9 inf_min  10 oe1  11 oe2  12 e1  13 e2  14 o1  15 o2
 *   16..16+log_n-1 e1S, then e2S  (dtype-wrapped gap-ext doubling)
 *
 * Plane pointers are the BASE of the [n_rows, width] dtype view; rows
 * sit row_stride elements apart (the arena interleaves planes).
 * Reference row semantics: /root/reference/src/simd_abpoa_align.c
 * :701-1010 (rows), :664-699 (SIMD_SET_F), :1043-1057 (row max).
 */
#include <stdint.h>

#define DPROW_MAXPN 64

#define T int16_t
#define FN(name) dprow_##name##_16
#include "dprow_impl.inc"
#undef T
#undef FN

#define T int32_t
#define FN(name) dprow_##name##_32
#include "dprow_impl.inc"
#undef T
#undef FN

/* One DP row; when need_max, also writes the row (max, argmax) with
 * reference blend semantics into out2[0..1]. Band metadata arrays
 * (max_remain/max_pos_*) are only read when prm says wb >= 0. */
int np_dp_row(const long long *prm, void *H, void *E1, void *E2,
              void *F1, void *F2, const void *qp,
              long long *dp_beg, long long *dp_end,
              long long *dp_beg_sn, long long *dp_end_sn,
              const int *pres, int n_pre, long long dp_i, int base,
              int bits, const long long *max_remain,
              const long long *max_pos_l, const long long *max_pos_r,
              long long node_id, long long end_remain, long long w,
              int need_max, long long *out2) {
    if (bits == 16)
        dprow_row_16(prm, (char *)H, (char *)E1, (char *)E2, (char *)F1,
                     (char *)F2, (const char *)qp, dp_beg, dp_end,
                     dp_beg_sn, dp_end_sn, pres, n_pre, dp_i, base,
                     max_remain, max_pos_l, max_pos_r, node_id,
                     end_remain, w, need_max, out2);
    else
        dprow_row_32(prm, (char *)H, (char *)E1, (char *)E2, (char *)F1,
                     (char *)F2, (const char *)qp, dp_beg, dp_end,
                     dp_beg_sn, dp_end_sn, pres, n_pre, dp_i, base,
                     max_remain, max_pos_l, max_pos_r, node_id,
                     end_remain, w, need_max, out2);
    return 0;
}

