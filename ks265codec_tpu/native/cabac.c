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
} Enc;

static inline void e_write_out(Enc *e) {
    int lead = (int)(e->low >> (24 - e->bits_left));
    e->bits_left += 8;
    e->low &= 0xFFFFFFFFu >> e->bits_left;
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
                       const int *ctx_bases) {
    tables_init(); scans_init();
    Enc e = {*low, *range, *bits_left, *num_buffered, *buffered_byte,
             out, 0, out_cap, ctx};
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
        for (int k = 0; k < num_sig; k++) {
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
    *low = e.low; *range = e.range; *bits_left = e.bits_left;
    *num_buffered = e.num_buffered; *buffered_byte = e.buffered_byte;
    return e.out_len;
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
             out, 0, out_cap, ctx};
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
