"""MP3 + FLAC decode tests.

MP3 fixtures are encoded with libmp3lame (present on this image) via ctypes;
FLAC fixtures are built by a minimal pure-Python encoder (verbatim and
constant subframes + left/side stereo) exercising the from-scratch C++
decoder's bit reader, subframe and decorrelation paths.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from open_musiclm_tpu.data.audio_io import have_mp3, read_audio


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------


def encode_mp3(path, samples, sr):
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    h = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(h, sr)
    lame.lame_set_num_channels(h, 1)
    lame.lame_set_mode(h, 3)  # mono
    lame.lame_set_brate(h, 64)
    assert lame.lame_init_params(h) >= 0
    pcm = np.ascontiguousarray(samples, np.float32)
    n = len(pcm)
    out = np.empty(n + 7200 * 2, np.uint8)
    # lame_encode_buffer_ieee_float(h, left, right, n, out, out_size)
    written = lame.lame_encode_buffer_ieee_float(
        h,
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        len(out),
    )
    assert written > 0
    tail = np.empty(7200, np.uint8)
    flushed = lame.lame_encode_flush(
        h, tail.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(tail)
    )
    lame.lame_close(h)
    with open(path, "wb") as f:
        f.write(out[:written].tobytes())
        f.write(tail[:flushed].tobytes())


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value, n):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def write_flac(path, channels_data, sr=8000, bps=16, block=256, stereo_mode="independent"):
    """channels_data: list of int arrays (one per channel), equal lengths."""
    nch = len(channels_data)
    total = len(channels_data[0])
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block, 16)  # min block
    si.write(block, 16)  # max block
    si.write(0, 24)  # min frame size (unknown)
    si.write(0, 24)  # max frame size
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    n_frames = (total + block - 1) // block
    for fi in range(n_frames):
        w = BitWriter()
        w.write(0x3FFE, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        bs = min(block, total - fi * block)
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(4, 4)  # sample rate code 4 = 8000 (ignored by decoder: uses streaminfo? ours uses table)
        if stereo_mode == "independent":
            w.write(nch - 1, 4)
        elif stereo_mode == "left_side":
            w.write(8, 4)
        w.write(4, 3)  # sample size: 16-bit
        w.write(0, 1)
        # utf8 frame number (fits in 1 byte for small fi)
        assert fi < 128
        w.write(fi, 8)
        w.write(bs - 1, 16)  # 16-bit blocksize
        w.write(0, 8)  # crc8 (unverified by our decoder)

        if stereo_mode == "left_side":
            left = channels_data[0][fi * block : fi * block + bs]
            right = channels_data[1][fi * block : fi * block + bs]
            subs = [(left, bps), ([l - r for l, r in zip(left, right)], bps + 1)]
        else:
            subs = [
                (ch[fi * block : fi * block + bs], bps) for ch in channels_data
            ]
        for vals, sbps in subs:
            w.write(0, 1)  # padding
            if len(set(vals)) == 1:
                w.write(0, 6)  # constant
                w.write(0, 1)  # no wasted bits
                w.write_signed(int(vals[0]), sbps)
            else:
                w.write(1, 6)  # verbatim
                w.write(0, 1)
                for v in vals:
                    w.write_signed(int(v), sbps)
        w.align()
        w.write(0, 16)  # crc16 (unverified)
        out += w.bytes()
    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not have_mp3(), reason="libmpg123 unavailable")
def test_mp3_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.mp3"
    encode_mp3(str(path), sig, sr)
    dec, out_sr = read_audio(str(path))
    assert out_sr == sr
    # lame adds encoder delay; compare spectra instead of samples
    assert abs(len(dec) - len(sig)) < 5000
    mid = dec[sr // 2 : sr // 2 + 8192]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * sr / len(mid)
    assert abs(peak_hz - 440) < 10
    # decode with resample
    dec2, sr2 = read_audio(str(path), target_sr=8000)
    assert sr2 == 8000 and abs(len(dec2) - len(dec) // 2) < 3000


def test_flac_mono_verbatim(tmp_path):
    rng = np.random.RandomState(0)
    vals = rng.randint(-30000, 30000, 700).astype(np.int64)
    path = tmp_path / "x.flac"
    write_flac(str(path), [vals], sr=8000)
    dec, sr = read_audio(str(path))
    assert sr == 8000
    assert len(dec) == 700
    np.testing.assert_allclose(dec, vals / 32768.0, atol=1e-6)


def test_flac_constant_subframe(tmp_path):
    vals = np.full(512, 1234, np.int64)
    path = tmp_path / "c.flac"
    write_flac(str(path), [vals], sr=8000)
    dec, sr = read_audio(str(path))
    np.testing.assert_allclose(dec, 1234 / 32768.0, atol=1e-6)


def test_flac_stereo_left_side(tmp_path):
    rng = np.random.RandomState(1)
    left = rng.randint(-20000, 20000, 512).astype(np.int64)
    right = rng.randint(-20000, 20000, 512).astype(np.int64)
    path = tmp_path / "s.flac"
    write_flac(str(path), [left, right], sr=8000, stereo_mode="left_side")
    dec, sr = read_audio(str(path))
    expected = (left + right) / 2.0 / 32768.0  # mono mixdown
    np.testing.assert_allclose(dec, expected, atol=1e-5)


def test_sound_dataset_reads_mp3_and_flac(tmp_path):
    from open_musiclm_tpu.data.dataset import SoundDataset

    rng = np.random.RandomState(2)
    vals = rng.randint(-20000, 20000, 8000).astype(np.int64)
    write_flac(str(tmp_path / "a.flac"), [vals], sr=8000)
    if have_mp3():
        sig = (0.3 * rng.randn(16000)).astype(np.float32)
        encode_mp3(str(tmp_path / "b.mp3"), sig, 16000)
    ds = SoundDataset(
        folder=str(tmp_path),
        max_length_seconds=(0.5,),
        normalize=(False,),
        target_sample_hz=(8000,),
        seq_len_multiple_of=(None,),
    )
    for i in range(len(ds)):
        v = ds[i]
        assert v.shape == (4000,)
        assert np.isfinite(v).all()
