"""Bitstream layer tests: bit IO round-trip, NAL framing/EPB, and
parameter-set + slice-header parsing against real reference streams."""

import numpy as np
import pytest

from ks265codec_tpu.bitstream.bitio import BitReader, BitWriter
from ks265codec_tpu.bitstream.nal import (NalType, insert_epb, parse_nals,
                                          remove_epb, write_nal)
from ks265codec_tpu.hevc.params import (parse_pps, parse_sps, parse_vps,
                                        write_pps, write_sps, write_vps)
from ks265codec_tpu.hevc.slicehdr import parse_slice_header


def test_bitio_roundtrip():
    rng = np.random.RandomState(0)
    w = BitWriter()
    ops = []
    for _ in range(2000):
        kind = rng.randint(4)
        if kind == 0:
            v = int(rng.randint(2)); w.write_bit(v); ops.append(("bit", v))
        elif kind == 1:
            n = int(rng.randint(1, 25)); v = int(rng.randint(1 << n))
            w.write_bits(v, n); ops.append(("bits", v, n))
        elif kind == 2:
            v = int(rng.randint(100000)); w.write_ue(v); ops.append(("ue", v))
        else:
            v = int(rng.randint(-50000, 50000)); w.write_se(v); ops.append(("se", v))
    w.rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    for op in ops:
        if op[0] == "bit":
            assert r.read_bit() == op[1]
        elif op[0] == "bits":
            assert r.read_bits(op[2]) == op[1]
        elif op[0] == "ue":
            assert r.read_ue() == op[1]
        else:
            assert r.read_se() == op[1]


def test_epb_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(50):
        raw = bytes(rng.randint(0, 4, size=rng.randint(1, 200), dtype=np.uint8))
        assert remove_epb(insert_epb(raw)) == raw
    # canonical cases
    assert insert_epb(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert insert_epb(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert remove_epb(b"\x00\x00\x03\x01") == b"\x00\x00\x01"


def test_nal_roundtrip():
    payload = b"\x00\x00\x01\x42\x00\x00\x00\x99"
    raw = write_nal(NalType.SPS, payload) + write_nal(NalType.PPS, b"\x80")
    nals = parse_nals(raw)
    assert [n.nal_type for n in nals] == [NalType.SPS, NalType.PPS]
    assert nals[0].rbsp == payload


def test_parse_reference_stream(stream_ai_full):
    bs, _ = stream_ai_full
    nals = parse_nals(bs.read_bytes())
    types = set(n.nal_type for n in nals)
    assert NalType.VPS in types and NalType.SPS in types and NalType.PPS in types
    sps_map, pps_map = {}, {}
    slices = 0
    for n in nals:
        if n.nal_type == NalType.SPS:
            s = parse_sps(n.rbsp)
            sps_map[s.sps_id] = s
            assert (s.width, s.height) == (320, 192)
            assert s.bit_depth_luma == 8 and s.chroma_format_idc == 1
        elif n.nal_type == NalType.PPS:
            p = parse_pps(n.rbsp)
            pps_map[p.pps_id] = p
        elif n.nal_type == NalType.VPS:
            parse_vps(n.rbsp)
        elif n.nal_type < 32:
            h, s, p, r = parse_slice_header(n.rbsp, n.nal_type, n.temporal_id,
                                            sps_map, pps_map)
            assert h.slice_type == 2  # all-intra
            assert r.byte_aligned()
            slices += 1
    assert slices == 10


def test_parse_interstream_headers(stream_hierb):
    bs, _ = stream_hierb
    nals = parse_nals(bs.read_bytes())
    sps_map, pps_map = {}, {}
    slice_types = []
    for n in nals:
        if n.nal_type == NalType.SPS:
            s = parse_sps(n.rbsp)
            sps_map[s.sps_id] = s
        elif n.nal_type == NalType.PPS:
            p = parse_pps(n.rbsp)
            pps_map[p.pps_id] = p
        elif n.nal_type < 32:
            h, _, _, r = parse_slice_header(n.rbsp, n.nal_type, n.temporal_id,
                                            sps_map, pps_map)
            assert r.byte_aligned()
            slice_types.append(h.slice_type)
    assert 2 in slice_types  # an I slice
    assert 0 in slice_types or 1 in slice_types  # inter slices


def test_write_parse_parameter_sets():
    from ks265codec_tpu.hevc.params import SPS, PPS, VPS, ShortTermRPS
    sps = SPS(width=1920, height=1080, log2_ctb=6)
    rps = ShortTermRPS(delta_pocs=[-1, -3], used=[1, 1], num_negative=2)
    sps.st_rps = [rps]
    s2 = parse_sps(write_sps(sps))
    assert (s2.width, s2.height, s2.log2_ctb) == (1920, 1080, 6)
    assert s2.st_rps[0].delta_pocs == [-1, -3]
    assert s2.st_rps[0].used == [1, 1]
    pps = PPS(init_qp=30, sign_data_hiding_enabled=1,
              deblocking_filter_control_present=1, deblocking_filter_disabled=1)
    p2 = parse_pps(write_pps(pps))
    assert p2.init_qp == 30 and p2.sign_data_hiding_enabled == 1
    assert p2.deblocking_filter_disabled == 1
    v2 = parse_vps(write_vps(VPS()))
    assert v2.vps_id == 0


def test_sei_roundtrip_and_hash_verify():
    """SEI framing round-trips; decoded_picture_hash is verified by the
    decoder; user-data SEI parses back."""
    import numpy as np
    from ks265codec_tpu.decode.decoder import HevcDecoder
    from ks265codec_tpu.encode.config import EncoderConfig
    from ks265codec_tpu.encode.encoder import encode_sequence
    from ks265codec_tpu.hevc.sei import parse_sei_rbsp, write_sei_rbsp
    from ks265codec_tpu.utils.yuv import YUVFrame

    # framing round-trip incl. >255-byte payload
    msgs = [(5, b"\x00" * 16 + b"hello"), (132, bytes(49)),
            (200, bytes(300))]
    rbsp = write_sei_rbsp(msgs)
    back = parse_sei_rbsp(rbsp)
    assert [(m.payload_type, m.payload) for m in back] == msgs

    rng = np.random.RandomState(3)
    frames = [YUVFrame(rng.randint(0, 255, (64, 96)).astype(np.uint8),
                       np.full((32, 48), 100, np.uint8),
                       np.full((32, 48), 150, np.uint8), poc=i)
              for i in range(2)]
    cfg = EncoderConfig(width=96, height=64, preset="ultrafast", qp=30,
                        intra_period=1, md5=True)
    bs, _ = encode_sequence(frames, cfg)
    dec = HevcDecoder()
    out = dec.decode_all(bs)
    assert len(out) == 2
    assert dec.hash_mismatches == 0
    assert any(m.payload_type == 132 and m.md5 for m in dec.sei_messages)
    assert any(m.payload_type == 5 and b"ks265codec_tpu" in m.user_data
               for m in dec.sei_messages)
    # a corrupted recon hash must be detected
    from ks265codec_tpu.bitstream.nal import parse_nals
    ns = list(parse_nals(bs))
    raw = bytearray(bs)
    # flip one bit inside a VCL payload, hash check must fire or conceal
    vcl_off = bs.find(b"\x00\x00\x01") + 3
    dec2 = HevcDecoder()
    corrupted = bytearray(bs)
    # find last suffix-SEI and corrupt its stored md5 instead (clean probe)
    idx = bs.rfind(b"\x00\x00\x01")
    corrupted[-10] ^= 0xFF
    out2 = dec2.decode_all(bytes(corrupted))
    assert dec2.hash_mismatches >= 1
