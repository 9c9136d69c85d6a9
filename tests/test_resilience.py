"""Error resilience: corrupt/truncated payloads must conceal and continue
(reference behavior: log + conceal + keep decoding, SURVEY.md 4.9 /
qy265dec.h bIllegalStream), never raise out of HevcDecoder.decode()."""

import numpy as np

from ks265codec_tpu.decode.decoder import HevcDecoder
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import encode_sequence

from test_encoder import _frames, W, H


def _stream(n=3, **kw):
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=30,
                        **kw)
    bs, recons = encode_sequence(_frames(n), cfg)
    return bs, recons


def _nal_offsets(bs: bytes):
    offs = []
    i = 0
    while True:
        j = bs.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        offs.append(j + 3)
        i = j + 3
    return offs


def test_corrupt_slice_payload_conceals():
    bs, recons = _stream(3, intra_period=64)
    offs = _nal_offsets(bs)
    # find the LAST VCL NAL and trash bytes deep inside its payload
    vcl = [o for o in offs if (bs[o] >> 1) & 0x3F <= 21]
    assert vcl
    tgt = vcl[-1]
    nxt = min([o - 3 for o in offs if o - 3 > tgt] + [len(bs)])
    mid = tgt + max(24, (nxt - tgt) // 2)
    corrupted = bytearray(bs)
    for k in range(mid, min(mid + 40, nxt)):
        corrupted[k] ^= 0x5A
    dec = HevcDecoder()
    out = dec.decode_all(bytes(corrupted))
    # every picture still comes out (the damaged one concealed), no raise
    assert len(out) == len(recons)
    # earlier (undamaged) frames are still bit-exact
    first = sorted(recons, key=lambda r: r.poc)[0]
    np.testing.assert_array_equal(out[0].y, first.y)


def test_truncated_mid_slice_no_raise():
    bs, recons = _stream(3, intra_period=1)
    offs = _nal_offsets(bs)
    vcl = [o for o in offs if (bs[o] >> 1) & 0x3F <= 21]
    cut = vcl[-1] + 30        # inside the last slice's payload
    out = HevcDecoder().decode_all(bs[:cut])
    assert len(out) >= len(recons) - 1


def test_entry_point_garbage_conceals():
    """WPP stream with zeroed slice payload (bogus entry points included)
    must not raise."""
    bs, recons = _stream(2, intra_period=1, wpp=True)
    offs = _nal_offsets(bs)
    vcl = [o for o in offs if (bs[o] >> 1) & 0x3F <= 21]
    tgt = vcl[-1]
    corrupted = bytearray(bs)
    for k in range(tgt + 10, min(tgt + 60, len(bs))):
        corrupted[k] = 0xFF if k % 2 else 0x00
    out = HevcDecoder().decode_all(bytes(corrupted))
    assert len(out) == len(recons)
