"""Annex-B NAL unit framing: start-code scan, emulation-prevention removal
and insertion.

Equivalent of the reference decoder's FindStartBytes / skipFristStartCode /
extractNalRbsp (SURVEY.md 2.4 "Decoder top") and the encoder's NAL assembly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class NalType(IntEnum):
    TRAIL_N = 0
    TRAIL_R = 1
    TSA_N = 2
    TSA_R = 3
    STSA_N = 4
    STSA_R = 5
    RADL_N = 6
    RADL_R = 7
    RASL_N = 8
    RASL_R = 9
    BLA_W_LP = 16
    BLA_W_RADL = 17
    BLA_N_LP = 18
    IDR_W_RADL = 19
    IDR_N_LP = 20
    CRA_NUT = 21
    VPS = 32
    SPS = 33
    PPS = 34
    AUD = 35
    EOS = 36
    EOB = 37
    FD = 38
    PREFIX_SEI = 39
    SUFFIX_SEI = 40


def is_vcl(t: int) -> bool:
    return t < 32


def is_irap(t: int) -> bool:
    return NalType.BLA_W_LP <= t <= 23


def is_idr(t: int) -> bool:
    return t in (NalType.IDR_W_RADL, NalType.IDR_N_LP)


def is_rasl(t: int) -> bool:
    return t in (NalType.RASL_N, NalType.RASL_R)


def is_sublayer_non_ref(t: int) -> bool:
    return t < 16 and (t & 1) == 0


@dataclass
class Nal:
    nal_type: int
    temporal_id: int  # nuh_temporal_id_plus1 - 1
    layer_id: int
    rbsp: bytes  # payload after the 2-byte header, EPB removed
    pts: int = 0
    # rbsp indices i where an emulation-prevention byte sat before rbsp[i]
    # (needed to map entry_point_offsets, which count EPB'd bytes, onto the
    # de-escaped rbsp — HEVC 7.4.7.1)
    epb_pos: tuple = ()


def split_annexb(data: bytes) -> list[tuple[int, int]]:
    """Return (start, end) byte ranges of NAL payloads (after start code)."""
    out = []
    i = 0
    n = len(data)
    starts = []
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        e = len(data) if k + 1 == len(starts) else starts[k + 1] - 3
        # trim the 0x00 of a 4-byte start code belonging to the NEXT nal
        while e > s and data[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        out.append((s, e))
    return out


def remove_epb(payload: bytes) -> bytes:
    """Strip emulation-prevention 0x03 bytes (00 00 03 xx -> 00 00 xx)."""
    return remove_epb_pos(payload)[0]


def remove_epb_pos(payload: bytes) -> tuple[bytes, tuple[int, ...]]:
    """Strip EPBs; also return rbsp indices where one was removed (the EPB
    sat immediately before rbsp[i] for each returned i)."""
    if b"\x00\x00\x03" not in payload:
        return payload, ()
    out = bytearray()
    pos: list[int] = []
    zeros = 0
    i = 0
    n = len(payload)
    while i < n:
        b = payload[i]
        if zeros >= 2 and b == 3 and i + 1 <= n:
            zeros = 0
            i += 1
            pos.append(len(out))
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out), tuple(pos)


def epb_insert_positions(rbsp: bytes) -> list[int]:
    """Indices i where insert_epb() will place a 0x03 before rbsp[i]
    (mirror of insert_epb; used to convert substream sizes into
    entry_point_offsets, which count post-escape bytes)."""
    pos = []
    zeros = 0
    for i, b in enumerate(rbsp):
        if zeros >= 2 and b <= 3:
            pos.append(i)
            zeros = 0
        zeros = zeros + 1 if b == 0 else 0
    return pos


def insert_epb(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 0x (x<=3) gets 03."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def parse_nals(data: bytes) -> list[Nal]:
    nals = []
    for s, e in split_annexb(data):
        if e - s < 2:
            continue
        hdr = (data[s] << 8) | data[s + 1]
        if hdr & 0x8000:  # forbidden_zero_bit
            continue
        nal_type = (hdr >> 9) & 0x3F
        layer_id = (hdr >> 3) & 0x3F
        tid_plus1 = hdr & 0x7
        if tid_plus1 == 0:
            continue
        rbsp, epb_pos = remove_epb_pos(data[s + 2:e])
        nals.append(Nal(nal_type, tid_plus1 - 1, layer_id, rbsp,
                        epb_pos=epb_pos))
    return nals


def write_nal(nal_type: int, rbsp: bytes, temporal_id: int = 0,
              long_start_code: bool = True) -> bytes:
    """Assemble one annex-B NAL: start code + 2-byte header + EPB'd payload."""
    hdr = bytes([(nal_type << 1) & 0x7E, temporal_id + 1])
    sc = b"\x00\x00\x00\x01" if long_start_code else b"\x00\x00\x01"
    return sc + hdr + insert_epb(rbsp)
