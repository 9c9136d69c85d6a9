"""CABAC binary arithmetic coding engines (decode + encode).

Python reference implementation of the normative engine (H.265 9.3.4.3 /
9.3.4.4); the C++ host engine in bitstream/native mirrors this byte-exactly.
Equivalent of the reference's CEncCabacEngine::EncodeBin*/EncodeFlush and
CDecCabac::DecodeBin* (SURVEY.md 2.3/2.4).

Contexts live in a caller-owned bytearray of packed states
((pStateIdx << 1) | valMPS) so WPP save/load (initSliceWPP/saveContext/
loadContext analog) is a simple slice copy.
"""

from __future__ import annotations

from ..hevc.cabac_tables import (NEXT_STATE_LPS, NEXT_STATE_MPS,
                                 RANGE_TAB_LPS, RENORM_TABLE)

# Flattened LPS table indexed by (pStateIdx << 2) | qRangeIdx
_LPS_FLAT = [RANGE_TAB_LPS[s][q] for s in range(64) for q in range(4)]


class CabacDec:
    """Arithmetic decoder, spec 9.3.4.3. Bits are consumed MSB-first from the
    RBSP starting at `start_byte` (must be byte-aligned)."""

    __slots__ = ("data", "nbits", "bitpos", "range", "offset", "ctx")

    def __init__(self, data: bytes, start_byte: int, ctx: bytearray):
        self.data = data
        self.nbits = len(data) * 8
        self.bitpos = start_byte * 8
        self.ctx = ctx
        self.range = 510
        self.offset = self._read_bits(9)

    def _read_bits(self, n: int) -> int:
        v = 0
        p = self.bitpos
        data = self.data
        nbits = self.nbits
        for _ in range(n):
            if p < nbits:
                v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            else:
                v <<= 1  # past-end bits read as 0 (decoder prefetch slack)
            p += 1
        self.bitpos = p
        return v

    def decode_bin(self, ctx_idx: int) -> int:
        state = self.ctx[ctx_idx]
        rng = self.range
        lps = _LPS_FLAT[((state >> 1) << 2) | ((rng >> 6) & 3)]
        rng -= lps
        offset = self.offset
        if offset >= rng:
            # LPS path
            bin_val = 1 - (state & 1)
            offset -= rng
            rng = lps
            self.ctx[ctx_idx] = NEXT_STATE_LPS[state]
        else:
            bin_val = state & 1
            self.ctx[ctx_idx] = NEXT_STATE_MPS[state]
        # renormalize
        while rng < 256:
            rng <<= 1
            offset = (offset << 1) | self._read_bits(1)
        self.range = rng
        self.offset = offset
        return bin_val

    def decode_bypass(self) -> int:
        offset = (self.offset << 1) | self._read_bits(1)
        if offset >= self.range:
            self.offset = offset - self.range
            return 1
        self.offset = offset
        return 0

    def decode_bypass_bins(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        rng = self.range - 2
        if self.offset >= rng:
            self.range = rng
            return 1
        while rng < 256:
            rng <<= 1
            self.offset = (self.offset << 1) | self._read_bits(1)
        self.range = rng
        return 0

    def byte_align_position(self) -> int:
        """Current consumed position in bytes (rounded up) — used after a
        terminate bin for PCM alignment / entry-point checks."""
        return (self.bitpos + 7) >> 3

    def save_ctx(self) -> bytearray:
        return bytearray(self.ctx)

    def load_ctx(self, saved: bytearray) -> None:
        self.ctx[:] = saved


class CabacEnc:
    """Arithmetic encoder, spec 9.3.4.4 (HM-equivalent low/range/bitsLeft
    formulation with carry-buffered byte output)."""

    __slots__ = ("low", "range", "bits_left", "num_buffered", "buffered_byte",
                 "out", "ctx", "bin_count", "_tail_bits")

    def __init__(self, ctx: bytearray):
        self.ctx = ctx
        self.out = bytearray()
        self.reset()

    def reset(self) -> None:
        self.low = 0
        self.range = 510
        self.bits_left = 23
        self.num_buffered = 0
        self.buffered_byte = 0xFF
        self.bin_count = 0

    def encode_bin(self, bin_val: int, ctx_idx: int) -> None:
        self.bin_count += 1
        state = self.ctx[ctx_idx]
        lps = _LPS_FLAT[((state >> 1) << 2) | ((self.range >> 6) & 3)]
        self.range -= lps
        if bin_val != (state & 1):
            nbits = RENORM_TABLE[lps >> 3]
            self.low = (self.low + self.range) << nbits
            self.range = lps << nbits
            self.ctx[ctx_idx] = NEXT_STATE_LPS[state]
            self.bits_left -= nbits
            if self.bits_left < 12:
                self._write_out()
        else:
            self.ctx[ctx_idx] = NEXT_STATE_MPS[state]
            if self.range >= 256:
                return
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
            if self.bits_left < 12:
                self._write_out()

    def encode_bypass(self, bin_val: int) -> None:
        self.bin_count += 1
        self.low <<= 1
        if bin_val:
            self.low += self.range
        self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def encode_bypass_bins(self, value: int, n: int) -> None:
        while n > 8:
            n -= 8
            self._encode_bypass_chunk((value >> n) & 0xFF, 8)
        self._encode_bypass_chunk(value & ((1 << n) - 1), n)

    def _encode_bypass_chunk(self, pattern: int, n: int) -> None:
        if n == 0:
            return
        self.bin_count += n
        self.low = (self.low << n) + (self.range * pattern)
        self.bits_left -= n
        if self.bits_left < 12:
            self._write_out()

    def encode_terminate(self, bin_val: int) -> None:
        self.bin_count += 1
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.low <<= 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def _write_out(self) -> None:
        lead = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= (0xFFFFFFFF >> self.bits_left)
        if lead == 0xFF:
            self.num_buffered += 1
        elif self.num_buffered > 0:
            carry = lead >> 8
            self.out.append((self.buffered_byte + carry) & 0xFF)
            fill = (0xFF + carry) & 0xFF
            for _ in range(self.num_buffered - 1):
                self.out.append(fill)
            self.buffered_byte = lead & 0xFF
            self.num_buffered = 1
        else:
            self.num_buffered = 1
            self.buffered_byte = lead & 0xFF

    def finish(self) -> bytes:
        """Flush (spec 9.3.4.4.5 / HM TEncBinCABAC::finish). Returns the
        CABAC byte payload; caller appends rbsp trailing bits."""
        if self.low >> (32 - self.bits_left):
            self.out.append((self.buffered_byte + 1) & 0xFF)
            for _ in range(self.num_buffered - 1):
                self.out.append(0x00)
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered > 0:
                self.out.append(self.buffered_byte)
            for _ in range(self.num_buffered - 1):
                self.out.append(0xFF)
        # write remaining 24 - bits_left bits of low (MSB part), plus the
        # trailing '1' stop bit handled by the caller via rbsp alignment.
        nbits = 24 - self.bits_left
        val = self.low >> 8
        # emit nbits MSB-first, then pad with the stop bit externally
        acc = val & ((1 << nbits) - 1) if nbits > 0 else 0
        # pack bits into bytes with a trailing '1' + zero padding: the spec's
        # rbsp_slice_segment_trailing_bits wants bit-granular append, so we
        # return (bytes, leftover_bits, leftover_count)
        self._tail_bits = (acc, nbits)  # type: ignore[attr-defined]
        return bytes(self.out)

    def get_tail_bits(self) -> tuple[int, int]:
        """(value, nbits) still to append after finish()."""
        return self._tail_bits  # type: ignore[attr-defined]

    def save_ctx(self) -> bytearray:
        return bytearray(self.ctx)

    def load_ctx(self, saved: bytearray) -> None:
        self.ctx[:] = saved
