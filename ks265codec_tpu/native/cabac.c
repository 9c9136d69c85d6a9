/* Native CABAC residual coding (HEVC 7.3.8.11 / 9.3) — the bit-serial hot
 * path of both encoder and decoder, driven per-TU from Python via ctypes.
 *
 * Byte-exact mirror of bitstream/cabac.py + the residual syntax in
 * decode/slice_dec.py::_residual and encode/sbac.py::write_residual (which
 * remain the reference implementations and the fallback when this library
 * is unavailable). Equivalent of the reference's CEncCabacEngine /
 * CDecCabac::parseCoeffNxN on the host side (SURVEY.md 2.3/2.4).
 *
 * Build: cc -O3 -fPIC -shared cabac.c -o _cabac.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ tables */

static const uint8_t RANGE_TAB_LPS[64][4] = {
    {128,176,208,240},{128,167,197,227},{128,158,187,216},{123,150,178,205},
    {116,142,169,195},{111,135,160,185},{105,128,152,175},{100,122,144,166},
    {95,116,137,158},{90,110,130,150},{85,104,123,142},{81,99,117,135},
    {77,94,111,128},{73,89,105,122},{69,85,100,116},{66,80,95,110},
    {62,76,90,104},{59,72,86,99},{56,69,81,94},{53,65,77,89},
    {51,62,73,85},{48,59,69,80},{46,56,66,76},{43,53,63,72},
    {41,50,59,69},{39,48,56,65},{37,45,54,62},{35,43,51,59},
    {33,41,48,56},{32,39,46,53},{30,37,43,50},{29,35,41,48},
    {27,33,39,45},{26,31,37,43},{24,30,35,41},{23,28,33,39},
    {22,27,32,37},{21,26,30,35},{20,24,29,33},{19,23,27,31},
    {18,22,26,30},{17,21,25,28},{16,20,23,27},{15,19,22,25},
    {14,18,21,24},{14,17,20,23},{13,16,19,22},{12,15,18,21},
    {12,14,17,20},{11,14,16,19},{11,13,15,18},{10,12,15,17},
    {10,12,14,16},{9,11,13,15},{9,11,12,14},{8,10,12,14},
    {8,9,11,13},{7,9,11,12},{7,9,10,12},{7,8,10,11},
    {6,8,9,11},{6,7,9,10},{6,7,8,9},{2,2,2,2},
};
static const uint8_t TRANS_IDX_LPS[64] = {
    0,0,1,2,2,4,4,5,6,7,8,9,9,11,11,12,13,13,15,15,16,16,18,18,19,19,21,21,
    22,22,23,24,24,25,26,26,27,27,28,29,29,30,30,30,31,32,32,33,33,33,34,34,
    35,35,35,36,36,36,37,37,37,38,38,63,
};
static const uint8_t RENORM[32] = {6,5,4,4,3,3,3,3,2,2,2,2,2,2,2,2,
                                   1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1};
static uint8_t NEXT_MPS[128], NEXT_LPS[128];
static const uint8_t SIG_CTX_4x4[16] = {0,1,4,5,2,3,4,5,6,6,8,8,7,7,8,8};

static int tables_init_done = 0;
static void tables_init(void) {
    if (tables_init_done) return;
    for (int s = 0; s < 64; s++) {
        for (int mps = 0; mps < 2; mps++) {
            int b = (s << 1) | mps;
            /* MPS transition saturates at 62; 63 is the terminate state */
            int nm = (s == 63) ? 63 : (s == 62 ? 62 : s + 1);
            NEXT_MPS[b] = (uint8_t)((nm << 1) | mps);
            int lm = (s == 0) ? 1 - mps : mps;
            NEXT_LPS[b] = (uint8_t)((TRANS_IDX_LPS[s] << 1) | lm);
        }
    }
    tables_init_done = 1;
}

/* scan orders: x | (y<<4) per entry; idx 0 diag, 1 hor, 2 ver */
static uint8_t SCAN4[3][16];
static uint8_t SCAN_SB[4][3][64];   /* sb grids: 1,2,4,8 per side */
static int scans_done = 0;

static void build_scan(int n, uint8_t *out, int scan_idx) {
    int k = 0;
    if (scan_idx == 1) {            /* horizontal */
        for (int y = 0; y < n; y++)
            for (int x = 0; x < n; x++) out[k++] = (uint8_t)(x | (y << 4));
    } else if (scan_idx == 2) {     /* vertical */
        for (int x = 0; x < n; x++)
            for (int y = 0; y < n; y++) out[k++] = (uint8_t)(x | (y << 4));
    } else {                        /* up-right diagonal (spec 6.5.3) */
        int x = 0, y = 0;
        while (k < n * n) {
            while (y >= 0) {
                if (y < n && x < n) out[k++] = (uint8_t)(x | (y << 4));
                y--; x++;
            }
            y = x; x = 0;
        }
    }
}
static void scans_init(void) {
    if (scans_done) return;
    for (int s = 0; s < 3; s++) build_scan(4, SCAN4[s], s);
    for (int i = 0; i < 4; i++)
        for (int s = 0; s < 3; s++) build_scan(1 << i, SCAN_SB[i][s], s);
    scans_done = 1;
}

static int sig_ctx_inc(int log2, int c_idx, int scan_idx, int xs, int ys,
                       int xp, int yp, int prev_csbf) {
    int ctx;
    if (log2 == 2) ctx = SIG_CTX_4x4[(yp << 2) + xp];
    else if (xs == 0 && ys == 0 && xp == 0 && yp == 0) ctx = 0;
    else {
        if (prev_csbf == 0) { int s = xp + yp; ctx = s == 0 ? 2 : (s < 3 ? 1 : 0); }
        else if (prev_csbf == 1) ctx = yp == 0 ? 2 : (yp == 1 ? 1 : 0);
        else if (prev_csbf == 2) ctx = xp == 0 ? 2 : (xp == 1 ? 1 : 0);
        else ctx = 2;
        if (c_idx == 0) {
            if (xs != 0 || ys != 0) ctx += 3;
            ctx += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
        } else ctx += (log2 == 3) ? 9 : 12;
    }
    if (c_idx > 0) ctx += 27;
    return ctx;
}

/* ------------------------------------------------------------ decoder core */

typedef struct {
    const uint8_t *data;
    long nbits, bitpos;
    int range, offset;
    uint8_t *ctx;
} Dec;

static inline int d_read_bit(Dec *d) {
    int v = 0;
    if (d->bitpos < d->nbits)
        v = (d->data[d->bitpos >> 3] >> (7 - (d->bitpos & 7))) & 1;
    d->bitpos++;
    return v;
}
static inline int d_bin(Dec *d, int ci) {
    uint8_t state = d->ctx[ci];
    int lps = RANGE_TAB_LPS[state >> 1][(d->range >> 6) & 3];
    int rng = d->range - lps;
    int bin;
    if (d->offset >= rng) {
        bin = 1 - (state & 1);
        d->offset -= rng;
        rng = lps;
        d->ctx[ci] = NEXT_LPS[state];
    } else {
        bin = state & 1;
        d->ctx[ci] = NEXT_MPS[state];
    }
    while (rng < 256) { rng <<= 1; d->offset = (d->offset << 1) | d_read_bit(d); }
    d->range = rng;
    return bin;
}
static inline int d_bypass(Dec *d) {
    d->offset = (d->offset << 1) | d_read_bit(d);
    if (d->offset >= d->range) { d->offset -= d->range; return 1; }
    return 0;
}
static inline int d_bypass_n(Dec *d, int n) {
    int v = 0;
    while (n--) v = (v << 1) | d_bypass(d);
    return v;
}

/* ------------------------------------------------------------ encoder core */

typedef struct {
    uint32_t low;
    int range, bits_left, num_buffered, buffered_byte;
    uint8_t *out;
    long out_len, out_cap;
    uint8_t *ctx;
    int overflow;
} Enc;

static inline void e_write_out(Enc *e) {
    int lead = (int)(e->low >> (24 - e->bits_left));
    e->bits_left += 8;
    e->low &= 0xFFFFFFFFu >> e->bits_left;
    if (e->out_len + e->num_buffered + 2 > e->out_cap) { e->overflow = 1; return; }
    if (lead == 0xFF) e->num_buffered++;
    else if (e->num_buffered > 0) {
        int carry = lead >> 8;
        e->out[e->out_len++] = (uint8_t)((e->buffered_byte + carry) & 0xFF);
        int fill = (0xFF + carry) & 0xFF;
        for (int i = 0; i < e->num_buffered - 1; i++)
            e->out[e->out_len++] = (uint8_t)fill;
        e->buffered_byte = lead & 0xFF;
        e->num_buffered = 1;
    } else {
        e->num_buffered = 1;
        e->buffered_byte = lead & 0xFF;
    }
}
static inline void e_bin(Enc *e, int bin, int ci) {
    uint8_t state = e->ctx[ci];
    int lps = RANGE_TAB_LPS[state >> 1][(e->range >> 6) & 3];
    e->range -= lps;
    if (bin != (state & 1)) {
        int nbits = RENORM[lps >> 3];
        e->low = (e->low + e->range) << nbits;
        e->range = lps << nbits;
        e->ctx[ci] = NEXT_LPS[state];
        e->bits_left -= nbits;
        if (e->bits_left < 12) e_write_out(e);
    } else {
        e->ctx[ci] = NEXT_MPS[state];
        if (e->range >= 256) return;
        e->low <<= 1;
        e->range <<= 1;
        e->bits_left -= 1;
        if (e->bits_left < 12) e_write_out(e);
    }
}
static inline void e_bypass(Enc *e, int bin) {
    e->low <<= 1;
    if (bin) e->low += (uint32_t)e->range;
    e->bits_left -= 1;
    if (e->bits_left < 12) e_write_out(e);
}
static inline void e_bypass_n(Enc *e, uint32_t val, int n) {
    while (n > 8) {
        n -= 8;
        uint32_t pat = (val >> n) & 0xFF;
        e->low = (e->low << 8) + (uint32_t)e->range * pat;
        e->bits_left -= 8;
        if (e->bits_left < 12) e_write_out(e);
    }
    if (n > 0) {
        uint32_t pat = val & ((1u << n) - 1);
        e->low = (e->low << n) + (uint32_t)e->range * pat;
        e->bits_left -= n;
        if (e->bits_left < 12) e_write_out(e);
    }
}

/* -------------------------------------------- residual parse (decoder side)
 * ctx_bases: [transform_skip, last_x, last_y, sig_cg, sig_flag, one_flag,
 *             abs_flag]
 * Returns 0; outputs coeffs (n*n int32, row-major) + ts_flag.            */
long ks_parse_residual(uint8_t *ctx, const uint8_t *data, long nbits,
                       long *bitpos, int *range, int *offset,
                       int log2, int c_idx, int scan_idx, int sbh,
                       int parse_ts,
                       const int *ctx_bases,
                       int32_t *coeffs, int *ts_flag) {
    tables_init(); scans_init();
    Dec d = {data, nbits, *bitpos, *range, *offset, ctx};
    const int n = 1 << log2;
    const int B_TS = ctx_bases[0], B_LX = ctx_bases[1], B_LY = ctx_bases[2],
              B_CG = ctx_bases[3], B_SIG = ctx_bases[4], B_ONE = ctx_bases[5],
              B_ABS = ctx_bases[6];
    memset(coeffs, 0, sizeof(int32_t) * n * n);
    *ts_flag = 0;
    if (parse_ts && log2 == 2)
        *ts_flag = d_bin(&d, B_TS + (c_idx == 0 ? 0 : 1));
    int ctx_off, ctx_shift;
    if (c_idx == 0) { ctx_off = 3 * (log2 - 2) + ((log2 - 1) >> 2); ctx_shift = (log2 + 1) >> 2; }
    else { ctx_off = 15; ctx_shift = log2 - 2; }
    int cmax = (log2 << 1) - 1;
    int lx = 0, ly = 0;
    while (lx < cmax && d_bin(&d, B_LX + ctx_off + (lx >> ctx_shift))) lx++;
    while (ly < cmax && d_bin(&d, B_LY + ctx_off + (ly >> ctx_shift))) ly++;
    if (lx > 3) { int nb2 = (lx >> 1) - 1; lx = ((2 + (lx & 1)) << nb2) + d_bypass_n(&d, nb2); }
    if (ly > 3) { int nb2 = (ly >> 1) - 1; ly = ((2 + (ly & 1)) << nb2) + d_bypass_n(&d, nb2); }
    if (scan_idx == 2) { int t = lx; lx = ly; ly = t; }
    const uint8_t *sb_scan = SCAN_SB[log2 - 2][scan_idx];
    const uint8_t *in_scan = SCAN4[scan_idx];
    int nsb = 1 << (log2 - 2);
    /* positions of (lx>>2, ly>>2) in sb scan; (lx&3, ly&3) in inner scan */
    int last_sb = -1, last_n = -1;
    for (int i = 0; i < nsb * nsb; i++)
        if ((sb_scan[i] & 15) == (lx >> 2) && (sb_scan[i] >> 4) == (ly >> 2)) { last_sb = i; break; }
    for (int i = 0; i < 16; i++)
        if ((in_scan[i] & 15) == (lx & 3) && (in_scan[i] >> 4) == (ly & 3)) { last_n = i; break; }
    uint8_t csbf[8][8];
    memset(csbf, 0, sizeof(csbf));
    int c1 = 1;
    for (int i = last_sb; i >= 0; i--) {
        int xs = sb_scan[i] & 15, ys = sb_scan[i] >> 4;
        int infer_dc = 0, coded;
        if (i < last_sb && i > 0) {
            int cc = ((xs + 1 < nsb) ? csbf[ys][xs + 1] : 0)
                   + ((ys + 1 < nsb) ? csbf[ys + 1][xs] : 0);
            if (cc > 1) cc = 1;
            if (c_idx > 0) cc += 2;
            coded = d_bin(&d, B_CG + cc);
            infer_dc = 1;
        } else coded = 1;
        csbf[ys][xs] = (uint8_t)coded;
        if (!coded) continue;
        int sig_ns[16], num_sig = 0, start;
        if (i == last_sb) { sig_ns[num_sig++] = last_n; start = last_n - 1; }
        else start = 15;
        int csbf_r = (xs + 1 < nsb) ? csbf[ys][xs + 1] : 0;
        int csbf_b = (ys + 1 < nsb) ? csbf[ys + 1][xs] : 0;
        int prev_csbf = csbf_r + 2 * csbf_b;
        for (int nn = start; nn >= 0; nn--) {
            if (nn > 0 || !infer_dc) {
                int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
                int inc = sig_ctx_inc(log2, c_idx, scan_idx, xs, ys, xp, yp, prev_csbf);
                if (d_bin(&d, B_SIG + inc)) { sig_ns[num_sig++] = nn; infer_dc = 0; }
            } else sig_ns[num_sig++] = 0;
        }
        if (num_sig == 0) continue;
        int ctx_set = (i > 0 && c_idx == 0) ? 2 : 0;
        if (c1 == 0) ctx_set += 1;
        c1 = 1;
        int one_base = B_ONE + (c_idx == 0 ? 0 : 16);
        int abs_base = B_ABS + (c_idx == 0 ? 0 : 4);
        int gt1[16]; memset(gt1, 0, sizeof(gt1));
        int first_c2 = -1;
        int lim = num_sig < 8 ? num_sig : 8;
        for (int k = 0; k < lim; k++) {
            int f = d_bin(&d, one_base + ctx_set * 4 + c1);
            gt1[k] = f;
            if (f) { c1 = 0; if (first_c2 == -1) first_c2 = k; }
            else if (c1 > 0 && c1 < 3) c1++;
        }
        int gt2 = 0;
        if (first_c2 != -1) gt2 = d_bin(&d, abs_base + ctx_set);
        int last_pos_sb = sig_ns[0], first_pos_sb = sig_ns[num_sig - 1];
        int hidden = sbh && (last_pos_sb - first_pos_sb > 3);
        int nsigns = num_sig - (hidden ? 1 : 0);
        uint32_t sign_bits = nsigns ? (uint32_t)d_bypass_n(&d, nsigns) : 0;
        int rice = 0, first_coeff2 = 1;
        long total = 0;
        int levels[16];
        for (int k = 0; k < num_sig; k++) {
            int abs_lvl = 1 + (k < 8 ? gt1[k] : 0) + ((k == first_c2) ? gt2 : 0);
            int base_level = (k < 8) ? (2 + first_coeff2) : 1;
            if (abs_lvl == base_level) {
                /* coeff_abs_level_remaining */
                int prefix = 0;
                while (prefix < 32 && d_bypass(&d)) prefix++;
                int rem;
                if (prefix < 3) rem = (prefix << rice) + (rice ? d_bypass_n(&d, rice) : 0);
                else {
                    int nb2 = prefix - 3 + rice;
                    int suffix = nb2 ? d_bypass_n(&d, nb2) : 0;
                    rem = (((1 << (prefix - 3)) + 2) << rice) + suffix;
                }
                abs_lvl = base_level + rem;
                if (abs_lvl > 3 * (1 << rice) && rice < 4) rice++;
            }
            if (abs_lvl >= 2) first_coeff2 = 0;
            total += abs_lvl;
            levels[k] = abs_lvl;
        }
        for (int k = 0; k < num_sig; k++) {
            int nn = sig_ns[k];
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            int lvl = levels[k];
            int sign;
            if (hidden && k == num_sig - 1) sign = (int)(total & 1);
            else sign = (int)((sign_bits >> (nsigns - 1 - k)) & 1);
            coeffs[((ys << 2) + yp) * n + (xs << 2) + xp] = sign ? -lvl : lvl;
        }
    }
    *bitpos = d.bitpos; *range = d.range; *offset = d.offset;
    return 0;
}

/* -------------------------------------------- residual write (encoder side)
 * Appends CABAC bytes into out (caller-provided scratch, cap must exceed
 * worst case ~ 3*n*n). Returns bytes appended; updates engine scalars.   */
long ks_write_residual(uint8_t *ctx, uint32_t *low, int *range,
                       int *bits_left, int *num_buffered, int *buffered_byte,
                       uint8_t *out, long out_cap,
                       const int32_t *coeffs, int log2, int c_idx,
                       int scan_idx, int write_ts_zero,
                       const int *ctx_bases, int sbh) {
    tables_init(); scans_init();
    Enc e = {*low, *range, *bits_left, *num_buffered, *buffered_byte,
             out, 0, out_cap, ctx, 0};
    const int n = 1 << log2;
    const int B_TS = ctx_bases[0], B_LX = ctx_bases[1], B_LY = ctx_bases[2],
              B_CG = ctx_bases[3], B_SIG = ctx_bases[4], B_ONE = ctx_bases[5],
              B_ABS = ctx_bases[6];
    if (write_ts_zero && log2 == 2)
        e_bin(&e, 0, B_TS + (c_idx == 0 ? 0 : 1));
    const uint8_t *sb_scan = SCAN_SB[log2 - 2][scan_idx];
    const uint8_t *in_scan = SCAN4[scan_idx];
    int nsb = 1 << (log2 - 2);
    /* last significant position */
    int last_sb = -1, last_n = -1;
    for (int i = nsb * nsb - 1; i >= 0 && last_sb < 0; i--) {
        int xs = sb_scan[i] & 15, ys = sb_scan[i] >> 4;
        for (int nn = 15; nn >= 0; nn--) {
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            if (coeffs[((ys << 2) + yp) * n + (xs << 2) + xp]) {
                last_sb = i; last_n = nn; break;
            }
        }
    }
    if (last_sb < 0) return -1;          /* caller must not pass all-zero */
    {
        int xs = sb_scan[last_sb] & 15, ys = sb_scan[last_sb] >> 4;
        int xp = in_scan[last_n] & 15, yp = in_scan[last_n] >> 4;
        int lx = (xs << 2) + xp, ly = (ys << 2) + yp;
        if (scan_idx == 2) { int t = lx; lx = ly; ly = t; }
        int ctx_off, ctx_shift;
        if (c_idx == 0) { ctx_off = 3 * (log2 - 2) + ((log2 - 1) >> 2); ctx_shift = (log2 + 1) >> 2; }
        else { ctx_off = 15; ctx_shift = log2 - 2; }
        int cmax = (log2 << 1) - 1;
        int vals[2] = {lx, ly};
        int bases[2] = {B_LX, B_LY};
        for (int t = 0; t < 2; t++) {
            int val = vals[t], group;
            if (val <= 3) group = val;
            else {
                int nb2 = 31 - __builtin_clz((unsigned)val) - 1;
                group = ((nb2 + 1) << 1) + ((val >> nb2) & 1);
            }
            for (int k = 0; k < group; k++)
                e_bin(&e, 1, bases[t] + ctx_off + (k >> ctx_shift));
            if (group < cmax)
                e_bin(&e, 0, bases[t] + ctx_off + (group >> ctx_shift));
        }
        for (int t = 0; t < 2; t++) {
            int val = vals[t];
            if (val > 3) {
                int nb2 = 31 - __builtin_clz((unsigned)val) - 1;
                int suffix = val - ((2 + ((val >> nb2) & 1)) << nb2);
                e_bypass_n(&e, (uint32_t)suffix, nb2);
            }
        }
    }
    uint8_t csbf[8][8];
    memset(csbf, 0, sizeof(csbf));
    for (int i = last_sb; i >= 0; i--) {
        int xs = sb_scan[i] & 15, ys = sb_scan[i] >> 4;
        int any = 0;
        for (int nn = 0; nn < 16 && !any; nn++) {
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            if (coeffs[((ys << 2) + yp) * n + (xs << 2) + xp]) any = 1;
        }
        csbf[ys][xs] = (uint8_t)any;
    }
    int c1 = 1;
    for (int i = last_sb; i >= 0; i--) {
        int xs = sb_scan[i] & 15, ys = sb_scan[i] >> 4;
        int coded = csbf[ys][xs];
        int infer_dc = 0;
        if (i < last_sb && i > 0) {
            int cc = ((xs + 1 < nsb) ? csbf[ys][xs + 1] : 0)
                   + ((ys + 1 < nsb) ? csbf[ys + 1][xs] : 0);
            if (cc > 1) cc = 1;
            if (c_idx > 0) cc += 2;
            e_bin(&e, coded, B_CG + cc);
            infer_dc = 1;
        } else coded = 1;
        if (!coded) continue;
        const int32_t *blk = coeffs;
        int sig_ns[16], num_sig = 0, start;
        if (i == last_sb) { sig_ns[num_sig++] = last_n; start = last_n - 1; }
        else start = 15;
        int csbf_r = (xs + 1 < nsb) ? csbf[ys][xs + 1] : 0;
        int csbf_b = (ys + 1 < nsb) ? csbf[ys + 1][xs] : 0;
        int prev_csbf = csbf_r + 2 * csbf_b;
        for (int nn = start; nn >= 0; nn--) {
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            int sig = blk[((ys << 2) + yp) * n + (xs << 2) + xp] != 0;
            if (nn > 0 || !infer_dc) {
                int inc = sig_ctx_inc(log2, c_idx, scan_idx, xs, ys, xp, yp, prev_csbf);
                e_bin(&e, sig, B_SIG + inc);
                if (sig) { sig_ns[num_sig++] = nn; infer_dc = 0; }
            } else sig_ns[num_sig++] = 0;
        }
        if (num_sig == 0) continue;
        int ctx_set = (i > 0 && c_idx == 0) ? 2 : 0;
        if (c1 == 0) ctx_set += 1;
        c1 = 1;
        int one_base = B_ONE + (c_idx == 0 ? 0 : 16);
        int abs_base = B_ABS + (c_idx == 0 ? 0 : 4);
        int levels[16];
        for (int k = 0; k < num_sig; k++) {
            int nn = sig_ns[k];
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            int32_t v = blk[((ys << 2) + yp) * n + (xs << 2) + xp];
            levels[k] = v < 0 ? -v : v;
        }
        int gt1[16]; memset(gt1, 0, sizeof(gt1));
        int first_c2 = -1;
        int lim = num_sig < 8 ? num_sig : 8;
        for (int k = 0; k < lim; k++) {
            int f = levels[k] > 1;
            e_bin(&e, f, one_base + ctx_set * 4 + c1);
            gt1[k] = f;
            if (f) { c1 = 0; if (first_c2 == -1) first_c2 = k; }
            else if (c1 > 0 && c1 < 3) c1++;
        }
        if (first_c2 != -1)
            e_bin(&e, levels[first_c2] > 2, abs_base + ctx_set);
        /* sign hiding: parity of the level sum encodes the sign of the
         * first-in-scan-order coefficient (the compute stage forced it) */
        int hidden = sbh && (sig_ns[0] - sig_ns[num_sig - 1] > 3);
        int nsigns = num_sig - (hidden ? 1 : 0);
        for (int k = 0; k < nsigns; k++) {
            int nn = sig_ns[k];
            int xp = in_scan[nn] & 15, yp = in_scan[nn] >> 4;
            e_bypass(&e, blk[((ys << 2) + yp) * n + (xs << 2) + xp] < 0);
        }
        int rice = 0, first_coeff2 = 1;
        for (int k = 0; k < num_sig; k++) {
            int base_level = (k < 8) ? (2 + first_coeff2) : 1;
            int lvl = levels[k];
            if (lvl >= base_level) {
                int rem = lvl - base_level;
                if ((rem >> rice) < 3) {
                    int prefix = rem >> rice;
                    for (int b = 0; b < prefix; b++) e_bypass(&e, 1);
                    e_bypass(&e, 0);
                    if (rice) e_bypass_n(&e, (uint32_t)(rem & ((1 << rice) - 1)), rice);
                } else {
                    int v = rem - (3 << rice);
                    int ell = 0;
                    while (v >= (1 << (ell + rice))) { v -= 1 << (ell + rice); ell++; }
                    for (int b = 0; b < 3 + ell; b++) e_bypass(&e, 1);
                    e_bypass(&e, 0);
                    if (ell + rice) e_bypass_n(&e, (uint32_t)v, ell + rice);
                }
                if (lvl > 3 * (1 << rice) && rice < 4) rice++;
            }
            if (lvl >= 2) first_coeff2 = 0;
        }
    }
    if (e.overflow) return -2;      /* caller must retry with a bigger cap */
    *low = e.low; *range = e.range; *bits_left = e.bits_left;
    *num_buffered = e.num_buffered; *buffered_byte = e.buffered_byte;
    return e.out_len;
}

/* ==========================================================================
 * Whole-slice syntax writer (encoder stage 2): consumes the dense per-4x4
 * decision maps + per-pixel coefficient planes produced by the compute
 * stage and entropy-codes the complete slice data (all WPP substreams,
 * terminate bits, alignment, final flush) in ONE call.
 *
 * Byte-exact mirror of encode/map_writer.py (the Python reference
 * implementation, A/B tested). This is the native analog of the
 * reference's CCtuSbac::processCtuSbac + CEncCabacEngine driven from
 * stored coding params (SURVEY.md 2.3 "CTU entropy coder").
 * ========================================================================== */

/* context-base indices in the bases[] array passed from Python
 * (first 7 match the residual writer's historical order) */
enum {
    CB_TS, CB_LAST_X, CB_LAST_Y, CB_SIG_CG, CB_SIG, CB_ONE, CB_ABS,
    CB_SAO_MERGE, CB_SAO_TYPE, CB_SPLIT_CU, CB_SKIP, CB_MERGE_FLAG,
    CB_MERGE_IDX, CB_PART_SIZE, CB_PRED_MODE, CB_INTRA_PRED,
    CB_CHROMA_PRED, CB_INTER_DIR, CB_MVD, CB_REF_IDX, CB_MVP_IDX,
    CB_DQP, CB_QT_CBF_LUMA, CB_QT_CBF_CHROMA, CB_QT_ROOT_CBF,
    CB_TRANS_SUBDIV, CB_COUNT
};

/* scalar params array indices */
enum {
    P_WIDTH, P_HEIGHT, P_PW, P_PH, P_LOG2_CTB, P_LOG2_MIN_CB,
    P_SLICE_TYPE, P_WPP, P_SAO_LUMA, P_SAO_CHROMA, P_TS_ENABLED,
    P_SBH, P_DQP_ENABLED, P_DQP_DEPTH, P_NREF0, P_NREF1,
    P_MAX_MERGE, P_SLICE_QP, P_NCTX, P_TT_INTRA, P_TT_INTER, P_COUNT
};

typedef struct {
    const int32_t *p;                 /* scalar params */
    const int *bases;
    /* per-4x4 maps, row-major (h4, w4) */
    const uint8_t *depth, *skip, *pred_mode, *intra_mode, *chroma_mode;
    const uint8_t *cbf_y, *cbf_cb, *cbf_cr;
    const uint8_t *merge_flag, *merge_idx, *inter_dir;
    const uint8_t *ref0, *ref1, *mvp0, *mvp1, *qpmap;
    const int16_t *mvd0, *mvd1;       /* (h4, w4, 2) */
    /* coeff planes */
    const int16_t *cy, *ccb, *ccr;
    /* sao per CTU: type (nctb,3) u8, off (nctb,3,4) i8, band u8, eo u8 */
    const uint8_t *sao_type;
    const int8_t *sao_off;
    const uint8_t *sao_band, *sao_eo;
    int w4, h4, wctb, hctb;
    uint8_t *coded;                   /* per-4x4 progression bitmap */
    Enc e;
    int err;
    const int32_t *ctb_tile;    /* per-CTB (raster) tile id; NULL = no tiles */
    int cur_tile;
    int log2_ctb;
    /* cu_qp_delta chain (QG = CTB): mirrors sbac.py begin_qg /
     * note_cu_qp / maybe_write_dqp / end_qg */
    int qp_prev, dqp_coded, qg_last_qp;
} SW;

static inline int sw_cell(const SW *sw, int x, int y) {
    return (y >> 2) * sw->w4 + (x >> 2);
}
static inline int sw_avail(const SW *sw, int x, int y) {
    if (x < 0 || y < 0 || x >= sw->p[P_WIDTH] || y >= sw->p[P_HEIGHT])
        return 0;
    if (sw->ctb_tile && sw->ctb_tile[(y >> sw->log2_ctb) * sw->wctb
                                     + (x >> sw->log2_ctb)] != sw->cur_tile)
        return 0;
    return sw->coded[sw_cell(sw, x, y)];
}

/* residual core reading from an int16 plane (copy rect then reuse logic) */
static void sw_residual(SW *sw, const int16_t *plane, int stride,
                        int x0, int y0, int log2, int c_idx, int scan_idx) {
    int32_t blk[32 * 32];
    const int n = 1 << log2;
    for (int r = 0; r < n; r++)
        for (int c = 0; c < n; c++)
            blk[r * n + c] = plane[(y0 + r) * stride + x0 + c];
    int wtz = sw->p[P_TS_ENABLED] && log2 == 2;
    /* inline: reuse ks_write_residual's body via a temporary Enc handoff */
    Enc *e = &sw->e;
    uint32_t low = e->low;
    int range = e->range, bits_left = e->bits_left,
        num_buffered = e->num_buffered, buffered_byte = e->buffered_byte;
    long r = ks_write_residual(e->ctx, &low, &range, &bits_left,
                               &num_buffered, &buffered_byte,
                               e->out + e->out_len, e->out_cap - e->out_len,
                               blk, log2, c_idx, scan_idx, wtz, sw->bases,
                               sw->p[P_SBH]);
    if (r < 0) { sw->err = (int)r; return; }
    e->low = low; e->range = range; e->bits_left = bits_left;
    e->num_buffered = num_buffered; e->buffered_byte = buffered_byte;
    e->out_len += r;
}

static int sw_scan_idx(int log2, int c_idx, int mode) {
    if (log2 == 2 || (log2 == 3 && c_idx == 0)) {
        if (mode >= 6 && mode <= 14) return 2;
        if (mode >= 22 && mode <= 30) return 1;
    }
    return 0;
}

/* ------------------------------------------------------------------- mvd */
static void sw_write_eg1(SW *sw, int value) {
    Enc *e = &sw->e;
    int count = 1, v = value;
    while (v >= (1 << count)) { v -= 1 << count; e_bypass(e, 1); count++; }
    e_bypass(e, 0);
    e_bypass_n(e, (uint32_t)v, count);
}
static void sw_maybe_dqp(SW *sw, int cell) {
    /* cu_qp_delta_abs/sign at the first residual-bearing TU of the QG
     * (7.3.8.11, 9.3.3: TU(5) ctx 0/1 + EG0 + bypass sign) — mirror of
     * sbac.SliceSyntaxWriter.maybe_write_dqp */
    Enc *e = &sw->e;
    if (!sw->p[P_DQP_ENABLED] || sw->dqp_coded) return;
    sw->dqp_coded = 1;
    int d = (int)sw->qpmap[cell] - sw->qp_prev;
    if (d > 25) d -= 52; else if (d < -26) d += 52;
    int v = d < 0 ? -d : d;
    e_bin(e, v > 0, sw->bases[CB_DQP]);
    if (v) {
        int k = 1;
        while (k < 5 && k < v) { e_bin(e, 1, sw->bases[CB_DQP] + 1); k++; }
        if (v < 5) e_bin(e, 0, sw->bases[CB_DQP] + 1);
        else {                        /* EG0 of v-5 */
            int v1 = (v - 5) + 1, cnt = 0;
            while ((v1 >> (cnt + 1)) > 0) cnt++;
            for (int i = 0; i < cnt; i++) e_bypass(e, 1);
            e_bypass(e, 0);
            for (int i = cnt - 1; i >= 0; i--)
                e_bypass(e, (v1 >> i) & 1);
        }
        e_bypass(e, d < 0);
    }
}

static void sw_write_mvd(SW *sw, int mx, int my) {
    Enc *e = &sw->e;
    int base = sw->bases[CB_MVD];
    int gt0x = mx != 0, gt0y = my != 0;
    e_bin(e, gt0x, base);
    e_bin(e, gt0y, base);
    int ax = mx < 0 ? -mx : mx, ay = my < 0 ? -my : my;
    if (gt0x) e_bin(e, ax > 1, base + 1);
    if (gt0y) e_bin(e, ay > 1, base + 1);
    if (gt0x) {
        if (ax > 1) sw_write_eg1(sw, ax - 2);
        e_bypass(e, mx < 0);
    }
    if (gt0y) {
        if (ay > 1) sw_write_eg1(sw, ay - 2);
        e_bypass(e, my < 0);
    }
}

/* ------------------------------------------------------------------ intra */
static int sw_nbr_mode(SW *sw, int px, int py, int nx, int ny, int above) {
    if (!sw_avail(sw, nx, ny)) return 1;
    if (above && (ny >> sw->p[P_LOG2_CTB]) != (py >> sw->p[P_LOG2_CTB]))
        return 1;
    int cell = sw_cell(sw, nx, ny);
    if (sw->pred_mode[cell] != 1) return 1;
    return sw->intra_mode[cell];
}
static void sw_mpm(SW *sw, int px, int py, int cands[3]) {
    int a = sw_nbr_mode(sw, px, py, px - 1, py, 0);
    int b = sw_nbr_mode(sw, px, py, px, py - 1, 1);
    if (a == b) {
        if (a < 2) { cands[0] = 0; cands[1] = 1; cands[2] = 26; }
        else {
            cands[0] = a;
            cands[1] = 2 + ((a + 29) % 32);
            cands[2] = 2 + ((a - 2 + 1) % 32);
        }
        return;
    }
    cands[0] = a; cands[1] = b;
    if (a != 0 && b != 0) cands[2] = 0;
    else if (a != 1 && b != 1) cands[2] = 1;
    else cands[2] = 26;
}

static void sw_intra_cu_header(SW *sw, int x0, int y0, int log2) {
    Enc *e = &sw->e;
    const int32_t *p = sw->p;
    int cell = sw_cell(sw, x0, y0);
    int mode = sw->intra_mode[cell];
    int cmode = sw->chroma_mode[cell];
    if (p[P_SLICE_TYPE] != 2)
        e_bin(e, 1, sw->bases[CB_PRED_MODE]);     /* intra */
    if (log2 == p[P_LOG2_MIN_CB])
        e_bin(e, 1, sw->bases[CB_PART_SIZE]);     /* 2Nx2N */
    int cands[3];
    sw_mpm(sw, x0, y0, cands);
    /* mark this PU's cells coded (MPM progression) */
    int b4 = (1 << log2) >> 2;
    for (int r = 0; r < b4; r++)
        for (int c = 0; c < b4; c++)
            sw->coded[((y0 >> 2) + r) * sw->w4 + (x0 >> 2) + c] = 1;
    int idx = -1;
    for (int k = 0; k < 3; k++) if (cands[k] == mode) { idx = k; break; }
    e_bin(e, idx >= 0, sw->bases[CB_INTRA_PRED]);
    if (idx >= 0) {
        e_bypass(e, idx ? 1 : 0);
        if (idx) e_bypass(e, idx - 1);
    } else {
        int sc[3] = {cands[0], cands[1], cands[2]};
        /* sort 3 */
        for (int i = 0; i < 2; i++)
            for (int j = i + 1; j < 3; j++)
                if (sc[j] < sc[i]) { int t = sc[i]; sc[i] = sc[j]; sc[j] = t; }
        int rem = mode;
        for (int i = 2; i >= 0; i--) if (rem > sc[i]) rem--;
        e_bypass_n(e, (uint32_t)rem, 5);
    }
    /* chroma (DM or one of the 4 table modes) */
    if (cmode == mode) e_bin(e, 0, sw->bases[CB_CHROMA_PRED]);
    else {
        static const int table[4] = {0, 26, 10, 1};
        int mapped[4], ci = 0;
        for (int i = 0; i < 4; i++)
            mapped[i] = (table[i] == mode) ? 34 : table[i];
        for (int i = 0; i < 4; i++) if (mapped[i] == cmode) { ci = i; break; }
        e_bin(e, 1, sw->bases[CB_CHROMA_PRED]);
        e_bypass_n(e, (uint32_t)ci, 2);
    }
}

/* -------------------------------------------------------------------- CU */
static void sw_write_cu(SW *sw, int x0, int y0, int log2, int depth) {
    Enc *e = &sw->e;
    const int32_t *p = sw->p;
    int size = 1 << log2, b4 = size >> 2;
    int cell = sw_cell(sw, x0, y0);
    int is_i = p[P_SLICE_TYPE] == 2;
    int intra = sw->pred_mode[cell] == 1;
    int x4 = x0 >> 2, y4 = y0 >> 2;
    sw->qg_last_qp = sw->qpmap[cell];     /* note_cu_qp */

    if (!is_i) {
        int skip = sw->skip[cell] != 0;
        int ctx = 0;
        if (sw_avail(sw, x0 - 1, y0)) ctx += sw->skip[sw_cell(sw, x0 - 1, y0)] != 0;
        if (sw_avail(sw, x0, y0 - 1)) ctx += sw->skip[sw_cell(sw, x0, y0 - 1)] != 0;
        e_bin(e, skip, sw->bases[CB_SKIP] + ctx);
        if (skip) {
            int midx = sw->merge_idx[cell];
            int cmax = p[P_MAX_MERGE] - 1;
            if (cmax > 0) {
                e_bin(e, midx > 0, sw->bases[CB_MERGE_IDX]);
                if (midx > 0) {
                    for (int k = 1; k < midx; k++) e_bypass(e, 1);
                    if (midx < cmax) e_bypass(e, 0);
                }
            }
            goto mark;
        }
    }
    if (intra) {
        sw_intra_cu_header(sw, x0, y0, log2);
        int cbf_y = sw->cbf_y[cell], cbf_cb = sw->cbf_cb[cell],
            cbf_cr = sw->cbf_cr[cell];
        int mode = sw->intra_mode[cell], cmode = sw->chroma_mode[cell];
        if (p[P_TT_INTRA] && log2 > 2 && log2 <= 5)
            /* explicit split_transform_flag = 0 (slices that USE splits
             * take the Python writer; the flag is present regardless) */
            e_bin(e, 0, sw->bases[CB_TRANS_SUBDIV] + 5 - log2);
        e_bin(e, cbf_cb != 0, sw->bases[CB_QT_CBF_CHROMA]);
        e_bin(e, cbf_cr != 0, sw->bases[CB_QT_CBF_CHROMA]);
        e_bin(e, cbf_y != 0, sw->bases[CB_QT_CBF_LUMA] + 1);
        if (cbf_y || cbf_cb || cbf_cr)
            sw_maybe_dqp(sw, cell);
        if (cbf_y)
            sw_residual(sw, sw->cy, p[P_PW], x0, y0, log2, 0,
                        sw_scan_idx(log2, 0, mode));
        if (cbf_cb)
            sw_residual(sw, sw->ccb, p[P_PW] >> 1, x0 >> 1, y0 >> 1,
                        log2 - 1, 1, sw_scan_idx(log2 - 1, 1, cmode));
        if (cbf_cr)
            sw_residual(sw, sw->ccr, p[P_PW] >> 1, x0 >> 1, y0 >> 1,
                        log2 - 1, 2, sw_scan_idx(log2 - 1, 2, cmode));
        return;                       /* intra header marked already */
    }
    /* inter 2Nx2N */
    e_bin(e, 0, sw->bases[CB_PRED_MODE]);
    e_bin(e, 1, sw->bases[CB_PART_SIZE]);
    int cbf_y = sw->cbf_y[cell], cbf_cb = sw->cbf_cb[cell],
        cbf_cr = sw->cbf_cr[cell];
    int cbf_any = cbf_y || cbf_cb || cbf_cr;
    int merge = sw->merge_flag[cell] != 0;
    e_bin(e, merge, sw->bases[CB_MERGE_FLAG]);
    if (merge) {
        int midx = sw->merge_idx[cell];
        int cmax = p[P_MAX_MERGE] - 1;
        if (cmax > 0) {
            e_bin(e, midx > 0, sw->bases[CB_MERGE_IDX]);
            if (midx > 0) {
                for (int k = 1; k < midx; k++) e_bypass(e, 1);
                if (midx < cmax) e_bypass(e, 0);
            }
        }
    } else {
        int idir = sw->inter_dir[cell];
        if (p[P_SLICE_TYPE] == 0) {   /* B: inter_pred_idc */
            if (size + size != 12) {
                e_bin(e, idir == 2, sw->bases[CB_INTER_DIR] + depth);
            }
            if (idir != 2 || size + size == 12)
                e_bin(e, idir == 1, sw->bases[CB_INTER_DIR] + 4);
        }
        for (int lst = 0; lst < 2; lst++) {
            if (idir != 2 && idir != lst) continue;
            int ridx = lst == 0 ? sw->ref0[cell] : sw->ref1[cell];
            int cmax = p[lst == 0 ? P_NREF0 : P_NREF1] - 1;
            if (cmax > 0) {
                e_bin(e, ridx > 0, sw->bases[CB_REF_IDX]);
                if (ridx > 0 && cmax > 1) {
                    e_bin(e, ridx > 1, sw->bases[CB_REF_IDX] + 1);
                    for (int k = 2; k < ridx; k++) e_bypass(e, 1);
                    if (ridx > 1 && ridx < cmax) e_bypass(e, 0);
                }
            }
            const int16_t *mvd = (lst == 0 ? sw->mvd0 : sw->mvd1)
                                 + (y4 * sw->w4 + x4) * 2;
            sw_write_mvd(sw, mvd[0], mvd[1]);
            e_bin(e, lst == 0 ? sw->mvp0[cell] : sw->mvp1[cell],
                  sw->bases[CB_MVP_IDX]);
        }
        e_bin(e, cbf_any, sw->bases[CB_QT_ROOT_CBF]);
    }
    if (cbf_any) {
        if (p[P_TT_INTER] && log2 > 2 && log2 <= 5)
            e_bin(e, 0, sw->bases[CB_TRANS_SUBDIV] + 5 - log2);
        e_bin(e, cbf_cb != 0, sw->bases[CB_QT_CBF_CHROMA]);
        e_bin(e, cbf_cr != 0, sw->bases[CB_QT_CBF_CHROMA]);
        if (cbf_cb || cbf_cr)
            e_bin(e, cbf_y != 0, sw->bases[CB_QT_CBF_LUMA] + 1);
        else cbf_y = 1;               /* inferred at inter depth-0 leaf */
        sw_maybe_dqp(sw, cell);
        if (cbf_y)
            sw_residual(sw, sw->cy, p[P_PW], x0, y0, log2, 0, 0);
        if (cbf_cb)
            sw_residual(sw, sw->ccb, p[P_PW] >> 1, x0 >> 1, y0 >> 1,
                        log2 - 1, 1, 0);
        if (cbf_cr)
            sw_residual(sw, sw->ccr, p[P_PW] >> 1, x0 >> 1, y0 >> 1,
                        log2 - 1, 2, 0);
    }
mark:
    for (int r = 0; r < b4; r++)
        for (int c = 0; c < b4; c++)
            sw->coded[(y4 + r) * sw->w4 + x4 + c] = 1;
}

static void sw_write_cq(SW *sw, int x0, int y0, int log2, int depth) {
    Enc *e = &sw->e;
    const int32_t *p = sw->p;
    int size = 1 << log2;
    int inside = (x0 + size <= p[P_WIDTH]) && (y0 + size <= p[P_HEIGHT]);
    int split;
    if (inside) {
        int cu_log2 = p[P_LOG2_CTB] - sw->depth[sw_cell(sw, x0, y0)];
        split = cu_log2 < log2;
    } else split = log2 > p[P_LOG2_MIN_CB];
    if (inside && log2 > p[P_LOG2_MIN_CB]) {
        int ctx = 0;
        if (sw_avail(sw, x0 - 1, y0))
            ctx += sw->depth[sw_cell(sw, x0 - 1, y0)] > depth;
        if (sw_avail(sw, x0, y0 - 1))
            ctx += sw->depth[sw_cell(sw, x0, y0 - 1)] > depth;
        e_bin(e, split, sw->bases[CB_SPLIT_CU] + ctx);
    }
    if (split) {
        int h = size >> 1;
        static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int k = 0; k < 4; k++) {
            int x1 = x0 + off[k][0] * h, y1 = y0 + off[k][1] * h;
            if (x1 < p[P_WIDTH] && y1 < p[P_HEIGHT])
                sw_write_cq(sw, x1, y1, log2 - 1, depth + 1);
        }
        return;
    }
    sw_write_cu(sw, x0, y0, log2, depth);
}

/* -------------------------------------------------------------------- SAO */
static int sw_sao_same(const SW *sw, int a, int b) {
    for (int c = 0; c < 3; c++) {
        if (sw->sao_type[a * 3 + c] != sw->sao_type[b * 3 + c]) return 0;
        if (sw->sao_band[a * 3 + c] != sw->sao_band[b * 3 + c]) return 0;
        if (sw->sao_eo[a * 3 + c] != sw->sao_eo[b * 3 + c]) return 0;
        for (int k = 0; k < 4; k++)
            if (sw->sao_off[(a * 3 + c) * 4 + k]
                != sw->sao_off[(b * 3 + c) * 4 + k]) return 0;
    }
    return 1;
}
static void sw_write_sao(SW *sw, int rx, int ry) {
    Enc *e = &sw->e;
    int idx = ry * sw->wctb + rx;
    int can_left = rx > 0 && (!sw->ctb_tile
        || sw->ctb_tile[idx - 1] == sw->cur_tile);
    int can_up = ry > 0 && (!sw->ctb_tile
        || sw->ctb_tile[idx - sw->wctb] == sw->cur_tile);
    if (can_left) {
        int ml = sw_sao_same(sw, idx, idx - 1);
        e_bin(e, ml, sw->bases[CB_SAO_MERGE]);
        if (ml) return;
    }
    if (can_up) {
        int mu = sw_sao_same(sw, idx, idx - sw->wctb);
        e_bin(e, mu, sw->bases[CB_SAO_MERGE]);
        if (mu) return;
    }
    for (int c = 0; c < 3; c++) {
        int enabled = c == 0 ? sw->p[P_SAO_LUMA] : sw->p[P_SAO_CHROMA];
        if (!enabled) continue;
        int t = sw->sao_type[idx * 3 + c];
        if (c != 2) {
            e_bin(e, t != 0, sw->bases[CB_SAO_TYPE]);
            if (t) e_bypass(e, t == 2);
        }
        if (t == 0) continue;
        const int8_t *offs = sw->sao_off + (idx * 3 + c) * 4;
        for (int k = 0; k < 4; k++) {
            int a = offs[k] < 0 ? -offs[k] : offs[k];
            for (int b = 0; b < a; b++) e_bypass(e, 1);
            if (a < 7) e_bypass(e, 0);
        }
        if (t == 1) {
            for (int k = 0; k < 4; k++)
                if (offs[k]) e_bypass(e, offs[k] < 0);
            e_bypass_n(e, sw->sao_band[idx * 3 + c], 5);
        } else if (c == 0 || c == 1) {
            e_bypass_n(e, sw->sao_eo[idx * 3 + c], 2);
        }
    }
}

/* -------------------------------------------------- terminate + substreams */
static void sw_terminate(Enc *e, int val) {
    e->range -= 2;
    if (val) {
        e->low += (uint32_t)e->range;
        e->low <<= 7;
        e->range = 2 << 7;
        e->bits_left -= 7;
    } else if (e->range >= 256) return;
    else {
        e->low <<= 1;
        e->range <<= 1;
        e->bits_left -= 1;
    }
    if (e->bits_left < 12) e_write_out(e);
}

static void sw_finish_substream(Enc *e) {
    /* HM TEncBinCABAC::finish + rbsp stop bit + byte alignment */
    if (e->out_len + e->num_buffered + 8 > e->out_cap) { e->overflow = 1; return; }
    if (e->low >> (32 - e->bits_left)) {
        e->out[e->out_len++] = (uint8_t)((e->buffered_byte + 1) & 0xFF);
        for (int i = 0; i < e->num_buffered - 1; i++)
            e->out[e->out_len++] = 0x00;
        e->low -= 1u << (32 - e->bits_left);
    } else {
        if (e->num_buffered > 0)
            e->out[e->out_len++] = (uint8_t)e->buffered_byte;
        for (int i = 0; i < e->num_buffered - 1; i++)
            e->out[e->out_len++] = 0xFF;
    }
    int nbits = 24 - e->bits_left;
    uint32_t val = (e->low >> 8) & ((nbits > 0) ? ((1u << nbits) - 1) : 0);
    uint32_t acc = (val << 1) | 1;
    int nb = nbits + 1;
    int pad = (8 - nb % 8) % 8;
    acc <<= pad; nb += pad;
    for (int k = nb - 8; k >= 0; k -= 8)
        e->out[e->out_len++] = (uint8_t)((acc >> k) & 0xFF);
    /* reset engine for the next substream */
    e->low = 0; e->range = 510; e->bits_left = 23;
    e->num_buffered = 0; e->buffered_byte = 0xFF;
}

/* ==========================================================================
 * Tile-parallel slice writer (the reference's task-manager / thread-pool
 * analog, SURVEY.md 2.3 CEncTaskManage): tiles restart CABAC contexts and
 * neighbor availability is tile-gated, so each tile's entropy coding is
 * fully independent -- a pthread pool writes tiles concurrently into
 * per-tile buffers which the caller's thread concatenates in tile-scan
 * order. The shared `coded` progression map is written at disjoint cells
 * (each worker only touches its own tile's region).
 * ========================================================================== */
#include <pthread.h>
#include <sched.h>

typedef struct {
    SW tmpl;                       /* template SW (shared input pointers) */
    const uint8_t *init_ctx;
    const int32_t *ts_to_rs;
    const int32_t *ctb_tile;
    int nctx, nctb, wctb, log2_ctb, sao_on;
    int ntiles;
    const int *tile_start;         /* ts index of each tile's first CTU */
    const int *tile_end;           /* exclusive */
    uint8_t **bufs; long *caps; long *lens; uint8_t **ctxs;
    int *errs;
    volatile int next;             /* work queue cursor */
    pthread_mutex_t mu;
} MTJob;

static void mt_write_tile(MTJob *j, int t) {
    SW sw = j->tmpl;
    uint8_t *ctx = j->ctxs[t];
    memcpy(ctx, j->init_ctx, (size_t)j->nctx);
    sw.e.low = 0; sw.e.range = 510; sw.e.bits_left = 23;
    sw.e.num_buffered = 0; sw.e.buffered_byte = 0xFF;
    sw.e.out = j->bufs[t]; sw.e.out_len = 0; sw.e.out_cap = j->caps[t];
    sw.e.ctx = ctx; sw.e.overflow = 0; sw.err = 0;
    sw.cur_tile = j->ctb_tile[j->ts_to_rs[j->tile_start[t]]];
    sw.qp_prev = sw.qg_last_qp = sw.p[P_SLICE_QP];  /* tile qp reset */
    int last_tile = (t == j->ntiles - 1);
    for (int ts = j->tile_start[t]; ts < j->tile_end[t]; ts++) {
        int addr = j->ts_to_rs[ts];
        int rx = addr % j->wctb, ry = addr / j->wctb;
        if (j->sao_on) sw_write_sao(&sw, rx, ry);
        sw.dqp_coded = 0;                           /* begin_qg */
        sw_write_cq(&sw, rx << j->log2_ctb, ry << j->log2_ctb,
                    j->log2_ctb, 0);
        sw.qp_prev = sw.qg_last_qp;                 /* end_qg */
        if (sw.err) { j->errs[t] = sw.err; return; }
        int last = last_tile && ts == j->tile_end[t] - 1;
        sw_terminate(&sw.e, last ? 1 : 0);
    }
    if (!last_tile)
        sw_terminate(&sw.e, 1);        /* end_of_subset */
    sw_finish_substream(&sw.e);
    if (sw.e.overflow) { j->errs[t] = -2; return; }
    j->lens[t] = sw.e.out_len;
}

static void *mt_worker(void *arg) {
    MTJob *j = (MTJob *)arg;
    for (;;) {
        pthread_mutex_lock(&j->mu);
        int t = j->next++;
        pthread_mutex_unlock(&j->mu);
        if (t >= j->ntiles) break;
        mt_write_tile(j, t);
    }
    return NULL;
}

long ks_write_slice_tiles_mt(const int32_t *params, const int *bases,
                             const uint8_t *init_ctx,
                             const uint8_t *depth, const uint8_t *skip,
                             const uint8_t *pred_mode,
                             const uint8_t *intra_mode,
                             const uint8_t *chroma_mode,
                             const uint8_t *cbf_y, const uint8_t *cbf_cb,
                             const uint8_t *cbf_cr,
                             const uint8_t *merge_flag,
                             const uint8_t *merge_idx,
                             const uint8_t *inter_dir, const uint8_t *ref0,
                             const uint8_t *ref1, const uint8_t *mvp0,
                             const uint8_t *mvp1, const uint8_t *qpmap,
                             const int16_t *mvd0, const int16_t *mvd1,
                             const int16_t *cy, const int16_t *ccb,
                             const int16_t *ccr,
                             const uint8_t *sao_type,
                             const int8_t *sao_off,
                             const uint8_t *sao_band,
                             const uint8_t *sao_eo,
                             const int32_t *ts_to_rs,
                             const int32_t *ctb_tile,
                             uint8_t *out, long out_cap,
                             int32_t *entry_sizes, int32_t *n_entries,
                             uint8_t *work, int nthreads) {
    tables_init(); scans_init();
    if (params[P_WPP] || !ts_to_rs || !ctb_tile)
        return -3;
    SW sw;
    memset(&sw, 0, sizeof(sw));
    sw.p = params; sw.bases = bases;
    sw.depth = depth; sw.skip = skip; sw.pred_mode = pred_mode;
    sw.intra_mode = intra_mode; sw.chroma_mode = chroma_mode;
    sw.cbf_y = cbf_y; sw.cbf_cb = cbf_cb; sw.cbf_cr = cbf_cr;
    sw.merge_flag = merge_flag; sw.merge_idx = merge_idx;
    sw.inter_dir = inter_dir; sw.ref0 = ref0; sw.ref1 = ref1;
    sw.mvp0 = mvp0; sw.mvp1 = mvp1; sw.qpmap = qpmap;
    sw.mvd0 = mvd0; sw.mvd1 = mvd1;
    sw.cy = cy; sw.ccb = ccb; sw.ccr = ccr;
    sw.sao_type = sao_type; sw.sao_off = sao_off;
    sw.sao_band = sao_band; sw.sao_eo = sao_eo;
    sw.w4 = params[P_PW] >> 2; sw.h4 = params[P_PH] >> 2;
    int log2_ctb = params[P_LOG2_CTB];
    sw.wctb = (params[P_WIDTH] + (1 << log2_ctb) - 1) >> log2_ctb;
    sw.hctb = (params[P_HEIGHT] + (1 << log2_ctb) - 1) >> log2_ctb;
    int nctx = params[P_NCTX];
    sw.coded = work + 2 * nctx;
    memset(sw.coded, 0, (size_t)(sw.w4 * sw.h4));
    sw.ctb_tile = ctb_tile;
    sw.log2_ctb = log2_ctb;
    int nctb = sw.wctb * sw.hctb;
    /* tile ranges from the scan map */
    int tile_start[256], tile_end[256];
    int ntiles = 0;
    for (int ts = 0; ts < nctb; ts++) {
        int tid = ctb_tile[ts_to_rs[ts]];
        if (ts == 0 || tid != ctb_tile[ts_to_rs[ts - 1]]) {
            if (ntiles == 256) return -3;
            tile_start[ntiles] = ts;
            if (ntiles) tile_end[ntiles - 1] = ts;
            ntiles++;
        }
    }
    tile_end[ntiles - 1] = nctb;
    MTJob j;
    j.tmpl = sw; j.init_ctx = init_ctx; j.ts_to_rs = ts_to_rs;
    j.ctb_tile = ctb_tile; j.nctx = nctx; j.nctb = nctb;
    j.wctb = sw.wctb; j.log2_ctb = log2_ctb;
    j.sao_on = params[P_SAO_LUMA] || params[P_SAO_CHROMA];
    j.ntiles = ntiles; j.tile_start = tile_start; j.tile_end = tile_end;
    j.next = 0;
    pthread_mutex_init(&j.mu, NULL);
    uint8_t *bufs[256]; long caps[256]; long lens[256]; int errs[256];
    uint8_t *ctxs[256];
    int ctb_px = 1 << log2_ctb;
    for (int t = 0; t < ntiles; t++) {
        long nct = tile_end[t] - tile_start[t];
        caps[t] = nct * (long)ctb_px * ctb_px * 3 + (1 << 16);
        bufs[t] = (uint8_t *)malloc((size_t)caps[t]);
        ctxs[t] = (uint8_t *)malloc((size_t)nctx);
        lens[t] = 0; errs[t] = 0;
        if (!bufs[t] || !ctxs[t]) return -4;
    }
    j.bufs = bufs; j.caps = caps; j.lens = lens; j.ctxs = ctxs;
    j.errs = errs;
    int nw = nthreads < ntiles ? nthreads : ntiles;
    if (nw < 1) nw = 1;
    pthread_t th[64];
    if (nw > 64) nw = 64;
    for (int i = 0; i < nw; i++)
        pthread_create(&th[i], NULL, mt_worker, &j);
    for (int i = 0; i < nw; i++)
        pthread_join(th[i], NULL);
    pthread_mutex_destroy(&j.mu);
    long total = 0;
    int err = 0, ne = 0;
    for (int t = 0; t < ntiles; t++) {
        if (errs[t]) err = errs[t];
        total += lens[t];
    }
    if (!err && total > out_cap) err = -2;
    if (!err) {
        long off = 0;
        for (int t = 0; t < ntiles; t++) {
            memcpy(out + off, bufs[t], (size_t)lens[t]);
            off += lens[t];
            if (t < ntiles - 1) entry_sizes[ne++] = (int32_t)lens[t];
        }
        *n_entries = ne;
    }
    for (int t = 0; t < ntiles; t++) { free(bufs[t]); free(ctxs[t]); }
    return err ? err : total;
}

long ks_write_slice(const int32_t *params, const int *bases,
                    const uint8_t *init_ctx,
                    const uint8_t *depth, const uint8_t *skip,
                    const uint8_t *pred_mode, const uint8_t *intra_mode,
                    const uint8_t *chroma_mode, const uint8_t *cbf_y,
                    const uint8_t *cbf_cb, const uint8_t *cbf_cr,
                    const uint8_t *merge_flag, const uint8_t *merge_idx,
                    const uint8_t *inter_dir, const uint8_t *ref0,
                    const uint8_t *ref1, const uint8_t *mvp0,
                    const uint8_t *mvp1, const uint8_t *qpmap,
                    const int16_t *mvd0, const int16_t *mvd1,
                    const int16_t *cy, const int16_t *ccb,
                    const int16_t *ccr,
                    const uint8_t *sao_type, const int8_t *sao_off,
                    const uint8_t *sao_band, const uint8_t *sao_eo,
                    const int32_t *ts_to_rs, const int32_t *ctb_tile,
                    uint8_t *out, long out_cap,
                    int32_t *entry_sizes, int32_t *n_entries,
                    uint8_t *work /* >= 2*nctx + h4*w4 bytes */) {
    tables_init(); scans_init();
    SW sw;
    memset(&sw, 0, sizeof(sw));
    sw.p = params; sw.bases = bases;
    sw.depth = depth; sw.skip = skip; sw.pred_mode = pred_mode;
    sw.intra_mode = intra_mode; sw.chroma_mode = chroma_mode;
    sw.cbf_y = cbf_y; sw.cbf_cb = cbf_cb; sw.cbf_cr = cbf_cr;
    sw.merge_flag = merge_flag; sw.merge_idx = merge_idx;
    sw.inter_dir = inter_dir; sw.ref0 = ref0; sw.ref1 = ref1;
    sw.mvp0 = mvp0; sw.mvp1 = mvp1; sw.qpmap = qpmap;
    sw.mvd0 = mvd0; sw.mvd1 = mvd1;
    sw.cy = cy; sw.ccb = ccb; sw.ccr = ccr;
    sw.sao_type = sao_type; sw.sao_off = sao_off;
    sw.sao_band = sao_band; sw.sao_eo = sao_eo;
    sw.w4 = params[P_PW] >> 2; sw.h4 = params[P_PH] >> 2;
    int log2_ctb = params[P_LOG2_CTB];
    sw.wctb = (params[P_WIDTH] + (1 << log2_ctb) - 1) >> log2_ctb;
    sw.hctb = (params[P_HEIGHT] + (1 << log2_ctb) - 1) >> log2_ctb;
    int nctx = params[P_NCTX];
    uint8_t *ctx = work;
    uint8_t *saved = work + nctx;
    sw.coded = work + 2 * nctx;
    memcpy(ctx, init_ctx, (size_t)nctx);
    memset(sw.coded, 0, (size_t)(sw.w4 * sw.h4));
    sw.e.low = 0; sw.e.range = 510; sw.e.bits_left = 23;
    sw.e.num_buffered = 0; sw.e.buffered_byte = 0xFF;
    sw.e.out = out; sw.e.out_len = 0; sw.e.out_cap = out_cap;
    sw.e.ctx = ctx; sw.e.overflow = 0;
    int wpp = params[P_WPP];
    int sao_on = params[P_SAO_LUMA] || params[P_SAO_CHROMA];
    int nctb = sw.wctb * sw.hctb;
    int ne = 0;
    long sub_start = 0;
    int have_saved = 0;
    sw.ctb_tile = ctb_tile;
    sw.log2_ctb = log2_ctb;
    sw.cur_tile = ctb_tile ? ctb_tile[ts_to_rs ? ts_to_rs[0] : 0] : 0;
    sw.qp_prev = sw.qg_last_qp = params[P_SLICE_QP];
    for (int ts = 0; ts < nctb; ts++) {
        int addr = ts_to_rs ? ts_to_rs[ts] : ts;
        int rx = addr % sw.wctb, ry = addr / sw.wctb;
        if (wpp && rx == 0 && ry > 0 && have_saved) {
            memcpy(ctx, saved, (size_t)nctx);
            sw.qp_prev = params[P_SLICE_QP];  /* qPY_PREV row reset */
        }
        int x0 = rx << log2_ctb, y0 = ry << log2_ctb;
        if (sao_on) sw_write_sao(&sw, rx, ry);
        sw.dqp_coded = 0;                     /* begin_qg */
        sw_write_cq(&sw, x0, y0, log2_ctb, 0);
        sw.qp_prev = sw.qg_last_qp;           /* end_qg */
        if (sw.err) return sw.err;
        if (wpp && rx == (sw.wctb - 1 < 1 ? sw.wctb - 1 : 1)) {
            memcpy(saved, ctx, (size_t)nctx);
            have_saved = 1;
        }
        int last = ts == nctb - 1;
        sw_terminate(&sw.e, last ? 1 : 0);
        if (wpp && rx == sw.wctb - 1 && !last) {
            sw_terminate(&sw.e, 1);
            sw_finish_substream(&sw.e);
            if (sw.e.overflow) return -2;
            entry_sizes[ne++] = (int32_t)(sw.e.out_len - sub_start);
            sub_start = sw.e.out_len;
        } else if (ctb_tile && !last) {
            int nrs = ts_to_rs[ts + 1];
            if (ctb_tile[nrs] != sw.cur_tile) {
                /* tile boundary: end_of_subset, flush, fresh contexts */
                sw_terminate(&sw.e, 1);
                sw_finish_substream(&sw.e);
                if (sw.e.overflow) return -2;
                entry_sizes[ne++] = (int32_t)(sw.e.out_len - sub_start);
                sub_start = sw.e.out_len;
                memcpy(ctx, init_ctx, (size_t)nctx);
                sw.cur_tile = ctb_tile[nrs];
                sw.qp_prev = params[P_SLICE_QP];  /* tile qp reset */
            }
        }
    }
    sw_finish_substream(&sw.e);
    if (sw.e.overflow) return -2;
    *n_entries = ne;
    return sw.e.out_len;
}

/* ------------------------------------------------ WPP row-parallel writer
 * Threaded entropy coding of WPP substreams (qy265executeEncCtuTaskWpp /
 * initSliceWPP analog): each CTB row is an independent substream whose
 * starting contexts are the row above's state after its 2nd CTB. Rows are
 * coded concurrently under the standard wavefront skew — row r may code
 * CTB x only once row r-1 has finished CTB x+1 — which also makes the
 * shared `coded` availability map safe: every above-row cell a CTB can
 * read was written before the release-store of the progress counter the
 * reader acquire-waits on. Output is byte-identical to ks_write_slice
 * with wpp=1 (same snapshot point, same per-row qp/ctx resets).         */
typedef struct {
    SW tmpl;
    const uint8_t *init_ctx;
    int nctx, wctb, hctb, log2_ctb, sao_on, last_term_row;
    uint8_t **ctxs;       /* per-row working contexts */
    uint8_t **snaps;      /* per-row ctx snapshot after CTB 1 */
    uint8_t **bufs;
    long *caps, *lens;
    int *errs;
    volatile int *progress;   /* CTBs completed per row */
    volatile int next_row;
    pthread_mutex_t mu;
} WMTJob;

static void wmt_write_row(WMTJob *j, int r) {
    SW sw = j->tmpl;
    uint8_t *ctx = j->ctxs[r];
    int nctx = j->nctx, wctb = j->wctb;
    int snap_rx = wctb - 1 < 1 ? wctb - 1 : 1;
    if (r == 0) {
        memcpy(ctx, j->init_ctx, (size_t)nctx);
    } else {
        int need = snap_rx + 1;      /* row above coded its snapshot CTB */
        while (__atomic_load_n(&j->progress[r - 1], __ATOMIC_ACQUIRE)
               < need) {
            if (j->errs[r - 1]) { j->errs[r] = j->errs[r - 1]; goto bail; }
            sched_yield();
        }
        memcpy(ctx, j->snaps[r - 1], (size_t)nctx);
    }
    sw.e.low = 0; sw.e.range = 510; sw.e.bits_left = 23;
    sw.e.num_buffered = 0; sw.e.buffered_byte = 0xFF;
    sw.e.out = j->bufs[r]; sw.e.out_len = 0; sw.e.out_cap = j->caps[r];
    sw.e.ctx = ctx; sw.e.overflow = 0; sw.err = 0;
    sw.qp_prev = sw.qg_last_qp = sw.p[P_SLICE_QP];
    for (int rx = 0; rx < wctb; rx++) {
        if (r > 0) {
            int need = rx + 2 < wctb ? rx + 2 : wctb;
            while (__atomic_load_n(&j->progress[r - 1], __ATOMIC_ACQUIRE)
                   < need) {
                if (j->errs[r - 1]) {
                    j->errs[r] = j->errs[r - 1];
                    goto bail;
                }
                sched_yield();
            }
        }
        if (j->sao_on) sw_write_sao(&sw, rx, r);
        sw.dqp_coded = 0;                        /* begin_qg */
        sw_write_cq(&sw, rx << j->log2_ctb, r << j->log2_ctb,
                    j->log2_ctb, 0);
        sw.qp_prev = sw.qg_last_qp;              /* end_qg */
        if (sw.err) { j->errs[r] = sw.err; goto bail; }
        if (rx == snap_rx)
            memcpy(j->snaps[r], ctx, (size_t)nctx);
        int last = (r == j->hctb - 1) && (rx == wctb - 1);
        sw_terminate(&sw.e, last ? 1 : 0);
        __atomic_store_n(&j->progress[r], rx + 1, __ATOMIC_RELEASE);
    }
    if (r < j->hctb - 1)
        sw_terminate(&sw.e, 1);                  /* end_of_subset */
    sw_finish_substream(&sw.e);
    if (sw.e.overflow) { j->errs[r] = -2; goto bail; }
    j->lens[r] = sw.e.out_len;
    return;
bail:
    /* release waiters so dependent rows do not spin forever */
    __atomic_store_n(&j->progress[r], wctb, __ATOMIC_RELEASE);
}

static void *wmt_worker(void *arg) {
    WMTJob *j = (WMTJob *)arg;
    for (;;) {
        pthread_mutex_lock(&j->mu);
        int r = j->next_row++;
        pthread_mutex_unlock(&j->mu);
        if (r >= j->hctb) break;
        wmt_write_row(j, r);
    }
    return NULL;
}

long ks_write_slice_wpp_mt(const int32_t *params, const int *bases,
                           const uint8_t *init_ctx,
                           const uint8_t *depth, const uint8_t *skip,
                           const uint8_t *pred_mode,
                           const uint8_t *intra_mode,
                           const uint8_t *chroma_mode,
                           const uint8_t *cbf_y, const uint8_t *cbf_cb,
                           const uint8_t *cbf_cr,
                           const uint8_t *merge_flag,
                           const uint8_t *merge_idx,
                           const uint8_t *inter_dir, const uint8_t *ref0,
                           const uint8_t *ref1, const uint8_t *mvp0,
                           const uint8_t *mvp1, const uint8_t *qpmap,
                           const int16_t *mvd0, const int16_t *mvd1,
                           const int16_t *cy, const int16_t *ccb,
                           const int16_t *ccr,
                           const uint8_t *sao_type,
                           const int8_t *sao_off,
                           const uint8_t *sao_band,
                           const uint8_t *sao_eo,
                           const int32_t *ts_to_rs,
                           const int32_t *ctb_tile,
                           uint8_t *out, long out_cap,
                           int32_t *entry_sizes, int32_t *n_entries,
                           uint8_t *work, int nthreads) {
    tables_init(); scans_init();
    if (!params[P_WPP] || ctb_tile)
        return -3;                      /* WPP-only path, no tiles */
    SW sw;
    memset(&sw, 0, sizeof(sw));
    sw.p = params; sw.bases = bases;
    sw.depth = depth; sw.skip = skip; sw.pred_mode = pred_mode;
    sw.intra_mode = intra_mode; sw.chroma_mode = chroma_mode;
    sw.cbf_y = cbf_y; sw.cbf_cb = cbf_cb; sw.cbf_cr = cbf_cr;
    sw.merge_flag = merge_flag; sw.merge_idx = merge_idx;
    sw.inter_dir = inter_dir; sw.ref0 = ref0; sw.ref1 = ref1;
    sw.mvp0 = mvp0; sw.mvp1 = mvp1; sw.qpmap = qpmap;
    sw.mvd0 = mvd0; sw.mvd1 = mvd1;
    sw.cy = cy; sw.ccb = ccb; sw.ccr = ccr;
    sw.sao_type = sao_type; sw.sao_off = sao_off;
    sw.sao_band = sao_band; sw.sao_eo = sao_eo;
    sw.w4 = params[P_PW] >> 2; sw.h4 = params[P_PH] >> 2;
    int log2_ctb = params[P_LOG2_CTB];
    sw.wctb = (params[P_WIDTH] + (1 << log2_ctb) - 1) >> log2_ctb;
    sw.hctb = (params[P_HEIGHT] + (1 << log2_ctb) - 1) >> log2_ctb;
    sw.log2_ctb = log2_ctb;
    sw.ctb_tile = NULL;
    sw.cur_tile = 0;
    int nctx = params[P_NCTX];
    sw.coded = work + 2 * nctx;
    memset(sw.coded, 0, (size_t)(sw.w4 * sw.h4));
    int hctb = sw.hctb, wctb = sw.wctb;
    if (hctb > 1024) return -3;
    WMTJob j;
    j.tmpl = sw; j.init_ctx = init_ctx; j.nctx = nctx;
    j.wctb = wctb; j.hctb = hctb; j.log2_ctb = log2_ctb;
    j.sao_on = params[P_SAO_LUMA] || params[P_SAO_CHROMA];
    j.next_row = 0;
    int ctb_px = 1 << log2_ctb;
    uint8_t **ctxs = (uint8_t **)malloc(sizeof(void *) * (size_t)hctb * 3);
    uint8_t **snaps = ctxs + hctb;
    uint8_t **bufs = ctxs + 2 * hctb;
    long *caps = (long *)malloc(sizeof(long) * (size_t)hctb * 2);
    long *lens = caps + hctb;
    int *errs = (int *)calloc((size_t)hctb, sizeof(int));
    int *progress = (int *)calloc((size_t)hctb, sizeof(int));
    if (!ctxs || !caps || !errs || !progress) return -4;
    for (int r = 0; r < hctb; r++) {
        caps[r] = (long)wctb * ctb_px * ctb_px * 3 + (1 << 16);
        bufs[r] = (uint8_t *)malloc((size_t)caps[r]);
        ctxs[r] = (uint8_t *)malloc((size_t)nctx * 2);
        snaps[r] = ctxs[r] + nctx;
        lens[r] = 0;
        if (!bufs[r] || !ctxs[r]) return -4;
    }
    j.ctxs = ctxs; j.snaps = snaps; j.bufs = bufs;
    j.caps = caps; j.lens = lens; j.errs = errs;
    j.progress = progress;
    pthread_mutex_init(&j.mu, NULL);
    int nw = nthreads < hctb ? nthreads : hctb;
    if (nw < 1) nw = 1;
    if (nw > 64) nw = 64;
    pthread_t th[64];
    for (int i = 0; i < nw; i++)
        pthread_create(&th[i], NULL, wmt_worker, &j);
    for (int i = 0; i < nw; i++)
        pthread_join(th[i], NULL);
    pthread_mutex_destroy(&j.mu);
    int err = 0;
    long total = 0;
    for (int r = 0; r < hctb; r++) {
        if (errs[r]) err = errs[r];
        total += lens[r];
    }
    if (!err && total > out_cap) err = -2;
    int ne = 0;
    if (!err) {
        long off = 0;
        for (int r = 0; r < hctb; r++) {
            memcpy(out + off, bufs[r], (size_t)lens[r]);
            off += lens[r];
            if (r < hctb - 1) entry_sizes[ne++] = (int32_t)lens[r];
        }
        *n_entries = ne;
    }
    for (int r = 0; r < hctb; r++) { free(bufs[r]); free(ctxs[r]); }
    free(ctxs); free(caps); free(errs); free(progress);
    return err ? err : total;
}

/* ==========================================================================
 * Wavefront schedule builder for the device intra coding pass.
 *
 * Walks the CU quadtree in z-order (identical recursion to the slice
 * writer), computing for every intra CU:
 *   - reference-sample availability masks at 4-sample-group granularity
 *     (spec 6.4.1 z-order availability, same predicate as the sequential
 *     coder's recon_done check), and
 *   - the DEPENDENCY LEVEL: 1 + max level over the cells its available
 *     reference samples come from. CUs of equal level have no data
 *     dependency, so the device executes each level as one batched step
 *     (the TPU-native form of the reference's wavefront: SURVEY.md 2.6
 *     "WPP -> batched anti-diagonal execution").
 * ========================================================================== */

typedef struct {
    const uint8_t *log2map;     /* (h8, w8): log2 CU size per 8x8 cell */
    const int32_t *tile8;       /* (h8, w8) tile id per cell; NULL = no tiles */
    int w8, h8, width, height, log2_min_cb;
    int32_t *lvl8;              /* per 8x8 cell level */
    uint8_t *coded8;
    int32_t *ox, *oy, *olog2, *olevel;
    uint32_t *oal, *oat;
    uint8_t *oac;
    long n;
} SB;

static int sb_same_tile(const SB *b, int x8, int y8, int c8x, int c8y) {
    if (!b->tile8) return 1;
    return b->tile8[y8 * b->w8 + x8] == b->tile8[c8y * b->w8 + c8x];
}

static void sb_emit(SB *b, int x, int y, int log2) {
    int n2 = 2 << log2;
    int ng = n2 >> 2;
    uint32_t al = 0, at = 0;
    uint8_t ac = 0;
    int32_t maxl = -1;
    int x8 = x >> 3, y8 = y >> 3;
    if (x > 0) {
        int c8x = (x - 1) >> 3;
        for (int g = 0; g < ng; g++) {
            int sy = y + 4 * g;
            if (sy >= b->height) break;
            int c8y = sy >> 3;
            if (b->coded8[c8y * b->w8 + c8x]
                && sb_same_tile(b, x8, y8, c8x, c8y)) {
                al |= 1u << g;
                int32_t l = b->lvl8[c8y * b->w8 + c8x];
                if (l > maxl) maxl = l;
            }
        }
        if (y > 0 && b->coded8[((y - 1) >> 3) * b->w8 + c8x]
            && sb_same_tile(b, x8, y8, c8x, (y - 1) >> 3)) {
            ac = 1;
            int32_t l = b->lvl8[((y - 1) >> 3) * b->w8 + c8x];
            if (l > maxl) maxl = l;
        }
    }
    if (y > 0) {
        int c8y = (y - 1) >> 3;
        for (int g = 0; g < ng; g++) {
            int sx = x + 4 * g;
            if (sx >= b->width) break;
            if (b->coded8[c8y * b->w8 + (sx >> 3)]
                && sb_same_tile(b, x8, y8, sx >> 3, c8y)) {
                at |= 1u << g;
                int32_t l = b->lvl8[c8y * b->w8 + (sx >> 3)];
                if (l > maxl) maxl = l;
            }
        }
    }
    int32_t level = maxl + 1;
    b->ox[b->n] = x; b->oy[b->n] = y;
    b->olog2[b->n] = 1 << log2;      /* store SIZE, not log2 */
    b->olevel[b->n] = level;
    b->oal[b->n] = al; b->oac[b->n] = ac; b->oat[b->n] = at;
    b->n++;
    int s8 = 1 << (log2 - 3);
    for (int r = 0; r < s8; r++)
        for (int c = 0; c < s8; c++) {
            int cell = ((y >> 3) + r) * b->w8 + (x >> 3) + c;
            b->lvl8[cell] = level;
            b->coded8[cell] = 1;
        }
}

static void sb_walk(SB *b, int x0, int y0, int log2) {
    int size = 1 << log2;
    int inside = (x0 + size <= b->width) && (y0 + size <= b->height);
    int split;
    if (inside) {
        int cu_log2 = b->log2map[(y0 >> 3) * b->w8 + (x0 >> 3)];
        split = cu_log2 < log2;
    } else split = log2 > b->log2_min_cb;
    if (split) {
        int h = size >> 1;
        static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int k = 0; k < 4; k++) {
            int x1 = x0 + off[k][0] * h, y1 = y0 + off[k][1] * h;
            if (x1 < b->width && y1 < b->height)
                sb_walk(b, x1, y1, log2 - 1);
        }
        return;
    }
    sb_emit(b, x0, y0, log2);
}

long ks_build_intra_schedule(
    const uint8_t *log2map, const int32_t *tile8, int w8, int h8,
    int width, int height, int log2_ctb, int log2_min_cb,
    int32_t *out_x, int32_t *out_y, int32_t *out_size, int32_t *out_level,
    uint32_t *out_avail_l, uint8_t *out_avail_c, uint32_t *out_avail_t,
    int32_t *work /* >= 2 * w8 * h8 int32 */) {
    SB b;
    b.log2map = log2map; b.tile8 = tile8; b.w8 = w8; b.h8 = h8;
    b.width = width; b.height = height; b.log2_min_cb = log2_min_cb;
    b.lvl8 = work;
    b.coded8 = (uint8_t *)(work + w8 * h8);
    memset(b.lvl8, 0, sizeof(int32_t) * w8 * h8);
    memset(b.coded8, 0, (size_t)(w8 * h8));
    b.ox = out_x; b.oy = out_y; b.olog2 = out_size; b.olevel = out_level;
    b.oal = out_avail_l; b.oac = out_avail_c; b.oat = out_avail_t;
    b.n = 0;
    int wctb = (width + (1 << log2_ctb) - 1) >> log2_ctb;
    int hctb = (height + (1 << log2_ctb) - 1) >> log2_ctb;
    for (int ry = 0; ry < hctb; ry++)
        for (int rx = 0; rx < wctb; rx++)
            sb_walk(&b, rx << log2_ctb, ry << log2_ctb, log2_ctb);
    return b.n;
}

/* Test hook: replay an op sequence through the encoder engine.
 * ops: triples (kind, a, b): kind 0 = ctx bin (a=ctx_idx, b=bin),
 * 1 = bypass (a=bin), 2 = bypass_bins (a=value, b=nbits). */
long ks_engine_replay(uint8_t *ctx, const int32_t *ops, long n_ops,
                      uint8_t *out, long out_cap,
                      uint32_t *low, int *range, int *bits_left,
                      int *num_buffered, int *buffered_byte) {
    tables_init();
    Enc e = {*low, *range, *bits_left, *num_buffered, *buffered_byte,
             out, 0, out_cap, ctx, 0};
    for (long i = 0; i < n_ops; i++) {
        int kind = ops[3 * i], a = ops[3 * i + 1], b = ops[3 * i + 2];
        if (kind == 0) e_bin(&e, b, a);
        else if (kind == 1) e_bypass(&e, a);
        else e_bypass_n(&e, (uint32_t)a, b);
    }
    *low = e.low; *range = e.range; *bits_left = e.bits_left;
    *num_buffered = e.num_buffered; *buffered_byte = e.buffered_byte;
    return e.out_len;
}
