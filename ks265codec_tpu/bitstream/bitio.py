"""Bit-level reader/writer for RBSP payloads (Exp-Golomb, flags, u(n)).

Equivalent of the reference's CBitStreamReader::{readBits,readUe,readSe,
readFlag} and CBitStreamWriter::{writeUeBig,allocBuffer,autoGrow}
(SURVEY.md 2.4 / 2.3). Operates on EPB-free RBSP bytes; EPB handling lives
in nal.py.
"""

from __future__ import annotations


class BitReaderError(ValueError):
    """Raised on read past end — maps to QY_BITSTREAM_ERROR semantics.
    A ValueError subclass so the decoder's undecodable-slice /
    concealment handlers (which catch ValueError) cover truncation."""


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def bits_left(self) -> int:
        return self.nbits - self.pos

    def byte_aligned(self) -> bool:
        return self.pos % 8 == 0

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise BitReaderError("read past end of bitstream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise BitReaderError("read past end of bitstream")
        self.pos = p + n
        # fast path: gather bytes spanning the window
        first = p >> 3
        last = (p + n - 1) >> 3
        chunk = int.from_bytes(self.data[first:last + 1], "big")
        total = (last - first + 1) * 8
        return (chunk >> (total - (p - first * 8) - n)) & ((1 << n) - 1)

    def read_flag(self) -> int:
        return self.read_bit()

    def read_ue(self) -> int:
        zeros = 0
        while self.read_bit() == 0:
            zeros += 1
            if zeros > 32:
                raise BitReaderError("ue(v) overflow")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.read_bits(zeros)

    def read_se(self) -> int:
        k = self.read_ue()
        return (k + 1) >> 1 if (k & 1) else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        """True if there is payload beyond the rbsp_stop_one_bit trailer."""
        if self.pos >= self.nbits:
            return False
        # find last byte with a set bit (the stop bit lives there)
        i = len(self.data) - 1
        while i >= 0 and self.data[i] == 0:
            i -= 1
        if i < 0:
            return False
        b = self.data[i]
        stop_bit_pos = i * 8 + 7 - ((b & -b).bit_length() - 1)
        return self.pos < stop_bit_pos


class BitWriter:
    __slots__ = ("buf", "cur", "ncur")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.ncur = 0

    def write_bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.ncur += 1
        if self.ncur == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.ncur = 0

    def write_bits(self, val: int, n: int) -> None:
        cur, ncur = self.cur, self.ncur
        cur = (cur << n) | (val & ((1 << n) - 1))
        ncur += n
        while ncur >= 8:
            ncur -= 8
            self.buf.append((cur >> ncur) & 0xFF)
        self.cur = cur & ((1 << ncur) - 1)
        self.ncur = ncur

    def write_flag(self, b: int) -> None:
        self.write_bit(1 if b else 0)

    def write_ue(self, val: int) -> None:
        v = val + 1
        n = v.bit_length()
        self.write_bits(0, n - 1)
        self.write_bits(v, n)

    def write_se(self, val: int) -> None:
        self.write_ue(2 * val - 1 if val > 0 else -2 * val)

    def byte_aligned(self) -> bool:
        return self.ncur == 0

    def rbsp_trailing_bits(self) -> None:
        self.write_bit(1)
        while self.ncur != 0:
            self.write_bit(0)

    def byte_align_zero(self) -> None:
        while self.ncur != 0:
            self.write_bit(0)

    def num_bits(self) -> int:
        return len(self.buf) * 8 + self.ncur

    def getvalue(self) -> bytes:
        assert self.ncur == 0, "bitstream not byte-aligned"
        return bytes(self.buf)
