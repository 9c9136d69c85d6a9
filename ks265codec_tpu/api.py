"""QY265-shaped API surface.

Python mirror of the reference's public C ABI (qy265enc.h:196-233,
qy265dec.h:59-85 — SURVEY.md 2.3/2.4) so users of the reference SDK find
the same entry points: open/encode-frame-async/delayed-frames/reconfig/
keyframe-request/close on the encoder; decode/get-frame/return-frame/flush
on the decoder. A lenthevcdec-style legacy shim (SURVEY.md 2.7) is
provided as well.

Status codes mirror qy265def.h:15-21.
"""

from __future__ import annotations

from .decode.decoder import HevcDecoder
from .encode.config import EncoderConfig, parse_config_string
from .encode.encoder import HevcEncoder

# qy265def.h-style status codes
QY_OK = 0
QY_SEARCHING_ACCESS_POINT = 1
QY_REF_PIC_NOT_FOUND = 2
QY_BITSTREAM_ERROR = -1
QY_CONFIG_BAD_NAME = -2
QY_CONFIG_BAD_VALUE = -3


# ----------------------------------------------------------------- encoder
def QY265ConfigDefault(width: int = 0, height: int = 0) -> EncoderConfig:
    return EncoderConfig(width=width, height=height)


def QY265ConfigDefaultPreset(width: int, height: int, preset: str,
                             tune: str = "default",
                             latency: str = "offline") -> EncoderConfig:
    return EncoderConfig(width=width, height=height, preset=preset,
                         tune=tune, latency=latency)


def QY265ConfigParse(cfg: EncoderConfig, name: str, value: str) -> int:
    """k=v override; returns QY_OK / QY_CONFIG_BAD_NAME / _BAD_VALUE."""
    try:
        parse_config_string(cfg, f"{name}={value}")
        return QY_OK
    except ValueError as e:
        return (QY_CONFIG_BAD_NAME if "BAD_NAME" in str(e)
                else QY_CONFIG_BAD_VALUE)


def QY265EncoderOpen(cfg: EncoderConfig) -> HevcEncoder:
    return HevcEncoder(cfg)


def QY265EncoderEncodeHeaders(enc: HevcEncoder) -> bytes:
    return enc.encode_headers()


def QY265EncoderEncodeFrame(enc: HevcEncoder, frame):
    """Returns a list of coded pictures (possibly empty — the encoder is
    asynchronous, qy265enc.h:153-155). Each has .data (annex-B NALs),
    .recon, .poc, .qp, .psnr."""
    return enc.encode_frame(frame)


def QY265EncoderDelayedFrames(enc: HevcEncoder):
    return enc.flush()


def QY265EncoderReconfig(enc: HevcEncoder, **kw) -> None:
    enc.reconfig(**kw)


def QY265EncoderKeyFrameRequest(enc: HevcEncoder) -> None:
    enc.keyframe_request()


def QY265EncoderClose(enc: HevcEncoder) -> None:
    enc.queue.clear()
    enc.dpb.clear()


# ----------------------------------------------------------------- decoder
class QY265Decoder:
    """QY265DecodeFrame / GetDecodedFrame / ReturnDecodedFrame / Flush."""

    def __init__(self, threads: int = 1, skip_mode: bool = False):
        self._threads = threads
        self._skip_mode = skip_mode
        self._dec = HevcDecoder(threads=threads, skip_mode=skip_mode)
        self._out = []

    def decode_frame(self, data: bytes, pts: int = 0) -> int:
        try:
            self._out.extend(self._dec.decode(data))
            return QY_OK
        except Exception:
            return QY_BITSTREAM_ERROR

    def get_decoded_frame(self):
        """Next display-order frame or None (caller must return_frame)."""
        if self._out:
            return self._out.pop(0)
        return None

    def return_decoded_frame(self, frame) -> None:
        pass                       # buffers are caller-owned numpy arrays

    def flush(self, clear_cached: bool = False) -> int:
        if clear_cached:
            self._out.clear()
            self._dec = HevcDecoder(threads=self._threads,
                                    skip_mode=self._skip_mode)
            return QY_OK
        self._out.extend(self._dec.flush())
        return QY_OK


def QY265DecoderOpen(threads: int = 1) -> QY265Decoder:
    return QY265Decoder(threads=threads)


def QY265DecoderClose(dec: QY265Decoder) -> None:
    dec._out.clear()


# ------------------------------------------------- lenthevcdec legacy shim
class LentHevcDecoder:
    """lenthevcdec.h-shaped flat API (SURVEY.md 2.7): create(threads,
    compatibility), decode_frame(au) -> (width, height, planes) or None,
    flush, destroy."""

    def __init__(self, threads: int = 1, compatibility: int = 100,
                 reserved=None):
        self._dec = HevcDecoder(threads=threads)
        self._pending = []

    def decode_frame(self, au: bytes, pts: int = 0):
        self._pending.extend(self._dec.decode(au))
        if not self._pending:
            return None
        f = self._pending.pop(0)
        return (f.width, f.height, (f.y, f.u, f.v))

    def flush(self):
        self._pending.extend(self._dec.flush())
        out = [(f.width, f.height, (f.y, f.u, f.v)) for f in self._pending]
        self._pending.clear()
        return out

    def destroy(self) -> None:
        self._pending.clear()


def lenthevcdec_create(threads: int = 1, compatibility: int = 100,
                       reserved=None) -> LentHevcDecoder:
    return LentHevcDecoder(threads, compatibility, reserved)
