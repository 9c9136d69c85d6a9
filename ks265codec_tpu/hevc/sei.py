"""SEI message read/write (spec 7.3.5 / Annex D).

Implemented payloads: decoded_picture_hash (MD5, type 132 — the
self-verifying conformance SEI), user_data_unregistered (type 5), and
recovery_point (type 6); any other type is kept as raw payload bytes so a
remuxer can pass it through. Reference surface: QY265EncoderEncodeHeaders
SEI emission + the decoder's SEI tolerance (SURVEY.md 2.4 "Param-set
reader": SEI skipped, not parsed — we parse)."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..bitstream.bitio import BitReader, BitWriter

SEI_USER_DATA_UNREGISTERED = 5
SEI_RECOVERY_POINT = 6
SEI_ACTIVE_PARAMETER_SETS = 129
SEI_DECODED_PICTURE_HASH = 132

KS265_UUID = bytes.fromhex("4b53323635545055"  # "KS265TPU"
                           "2d6a61782d303031")  # "-jax-001"


@dataclass
class SeiMessage:
    payload_type: int = 0
    payload: bytes = b""
    # decoded fields for known types
    md5: tuple = ()                 # decoded_picture_hash: (y, cb, cr) hex
    user_data: bytes = b""
    recovery_poc_cnt: int = 0
    exact_match: int = 1
    fields: dict = field(default_factory=dict)


def plane_md5(plane) -> str:
    import numpy as np
    return hashlib.md5(np.ascontiguousarray(
        plane.astype(np.uint8)).tobytes()).hexdigest()


# ---------------------------------------------------------------- parsing

def parse_sei_rbsp(rbsp: bytes) -> list[SeiMessage]:
    """Parse all SEI messages in one SEI NAL's RBSP."""
    out = []
    pos = 0
    n = len(rbsp)
    while pos < n - 1:          # final byte is the rbsp stop pattern
        ptype = 0
        while pos < n and rbsp[pos] == 0xFF:
            ptype += 255
            pos += 1
        if pos >= n:
            break
        ptype += rbsp[pos]
        pos += 1
        size = 0
        while pos < n and rbsp[pos] == 0xFF:
            size += 255
            pos += 1
        if pos >= n:
            break
        size += rbsp[pos]
        pos += 1
        payload = rbsp[pos:pos + size]
        pos += size
        m = SeiMessage(payload_type=ptype, payload=payload)
        try:
            _decode_payload(m)
        except Exception:
            pass                 # keep raw payload on malformed content
        out.append(m)
        if pos >= n or rbsp[pos] == 0x80:
            break
    return out


def _decode_payload(m: SeiMessage) -> None:
    if m.payload_type == SEI_DECODED_PICTURE_HASH:
        if m.payload and m.payload[0] == 0 and len(m.payload) >= 1 + 48:
            m.md5 = tuple(m.payload[1 + 16 * i:1 + 16 * (i + 1)].hex()
                          for i in range(3))
    elif m.payload_type == SEI_USER_DATA_UNREGISTERED:
        m.user_data = m.payload[16:]
    elif m.payload_type == SEI_RECOVERY_POINT:
        r = BitReader(m.payload)
        m.recovery_poc_cnt = r.read_se()
        m.exact_match = r.read_bit()
        m.fields["broken_link"] = r.read_bit()


# ---------------------------------------------------------------- writing

def _write_sei_header(out: bytearray, ptype: int, size: int) -> None:
    while ptype >= 255:
        out.append(0xFF)
        ptype -= 255
    out.append(ptype)
    while size >= 255:
        out.append(0xFF)
        size -= 255
    out.append(size)


def write_sei_rbsp(messages: list[tuple[int, bytes]]) -> bytes:
    """(payload_type, payload_bytes)* -> SEI RBSP incl. trailing bits."""
    out = bytearray()
    for ptype, payload in messages:
        _write_sei_header(out, ptype, len(payload))
        out += payload
    out.append(0x80)             # rbsp_trailing_bits
    return bytes(out)


def picture_hash_payload(y, cb, cr) -> bytes:
    """decoded_picture_hash with hash_type 0 (MD5 per plane)."""
    import numpy as np
    out = bytearray([0])
    for p in (y, cb, cr):
        out += hashlib.md5(np.ascontiguousarray(
            p.astype(np.uint8)).tobytes()).digest()
    return bytes(out)


def user_data_payload(text: bytes) -> bytes:
    return KS265_UUID + text


def recovery_point_payload(poc_cnt: int, exact: int = 1,
                           broken_link: int = 0) -> bytes:
    w = BitWriter()
    w.write_se(poc_cnt)
    w.write_bit(exact)
    w.write_bit(broken_link)
    w.rbsp_trailing_bits()
    return w.getvalue()


def pic_timing_payload(pic_struct: int = 0,
                       source_scan_type: int = 1,
                       duplicate: int = 0) -> bytes:
    """pic_timing SEI payload (Annex D.2.3) for streams whose VUI sets
    frame_field_info_present (no HRD: only the frame-field fields).
    pic_struct 0 = progressive frame."""
    acc = (pic_struct << 4) | (source_scan_type << 2) | (duplicate << 1) | 1
    return bytes([acc])
