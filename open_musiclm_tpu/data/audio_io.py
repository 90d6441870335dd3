"""ctypes bindings for the native audioio library (+ stdlib WAV fallback).

The C++ library (native/audioio) is the framework's audio decode path —
replacing the reference's torchaudio sox/ffmpeg backends (data.py:11,17,120).
It decodes WAV (PCM 8/16/24/32, float32/64), mixes to mono and resamples
with the same windowed-sinc kernel as ops/audio.py. ctypes calls release the
GIL, so a Python thread pool gets true parallel decode.

If the shared library hasn't been built (``native/build.sh``), we build it on
first use; failing that, a numpy + stdlib-``wave`` fallback covers PCM16 WAV.
MP3 decodes through libmpg123 (dlopen'd by the native library) and FLAC
through our from-scratch C++ decoder — covering the reference's full
['flac', 'wav', 'mp3'] extension surface (data.py:67).
"""

from __future__ import annotations

import ctypes
import subprocess
import wave as wave_mod
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "lib" / "libaudioio.so"
_BUILD_SCRIPT = _REPO_ROOT / "native" / "build.sh"

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and _BUILD_SCRIPT.exists():
        try:
            subprocess.run(["bash", str(_BUILD_SCRIPT)], check=True, capture_output=True)
        except Exception:
            pass
    if _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.aio_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.aio_wav_info.restype = ctypes.c_int
        lib.aio_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.aio_read_wav.restype = ctypes.c_long
        lib.aio_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.aio_resample.restype = ctypes.c_long
        lib.aio_write_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.aio_write_wav.restype = ctypes.c_int
        for name in ("aio_read_mp3", "aio_read_flac"):
            fn = getattr(lib, name, None)
            if fn is not None:
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int),
                ]
                fn.restype = ctypes.c_long
        if hasattr(lib, "aio_have_mp3"):
            lib.aio_have_mp3.restype = ctypes.c_int
        _lib = lib
    else:
        _lib = False
    return _lib


def have_native() -> bool:
    return bool(_load_lib())


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, frames)."""
    lib = _load_lib()
    if lib:
        sr, ch, fr = ctypes.c_int(), ctypes.c_int(), ctypes.c_long()
        rc = lib.aio_wav_info(str(path).encode(), sr, ch, fr)
        if rc != 0:
            raise IOError(f"failed to parse wav {path} (rc={rc})")
        return sr.value, ch.value, fr.value
    with wave_mod.open(str(path), "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def read_audio(path: str, target_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Decode WAV/MP3/FLAC to mono float32 (resampled if target_sr given).
    Returns (samples, sample_rate_of_returned_audio)."""
    p = str(path).lower()
    if p.endswith(".mp3"):
        return _read_via(path, "aio_read_mp3", target_sr)
    if p.endswith(".flac"):
        return _read_via(path, "aio_read_flac", target_sr)
    return read_wav(path, target_sr)


def _read_via(path: str, fn_name: str, target_sr: Optional[int]) -> Tuple[np.ndarray, int]:
    lib = _load_lib()
    if not lib or not hasattr(lib, fn_name):
        raise IOError(f"native decoder for {fn_name} unavailable; rebuild native/")
    fn = getattr(lib, fn_name)
    size = Path(path).stat().st_size
    # generous capacity: mp3 <= ~14x compression at 16-bit, flac <= ~4x
    cap = max(int(size * 24), 1 << 20)
    if target_sr:
        cap = int(cap * max(target_sr / 8000, 1.0)) + 64
    buf = np.empty(cap, np.float32)
    native_sr = ctypes.c_int()
    n = fn(
        str(path).encode(),
        int(target_sr or 0),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        native_sr,
    )
    if n < 0:
        raise IOError(f"failed to decode {path} (rc={n})")
    return buf[:n].copy(), (target_sr or native_sr.value)


def have_mp3() -> bool:
    lib = _load_lib()
    return bool(lib) and hasattr(lib, "aio_have_mp3") and bool(lib.aio_have_mp3())


def read_wav(path: str, target_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Decode a WAV to mono float32 (resampled if target_sr given)."""
    p = str(path)
    lib = _load_lib()
    if lib:
        sr, ch, fr = wav_info(p)
        t = target_sr or 0
        cap = int(fr * (max(t, sr) / sr + 1)) + 64
        buf = np.empty(cap, np.float32)
        native_sr = ctypes.c_int()
        n = lib.aio_read_wav(
            p.encode(),
            int(t),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
            native_sr,
        )
        if n < 0:
            raise IOError(f"failed to decode {p} (rc={n})")
        return buf[:n].copy(), (target_sr or native_sr.value)
    # stdlib fallback: PCM16 only
    with wave_mod.open(p, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise IOError(f"stdlib fallback supports PCM16 only: {p}")
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    mono = raw.reshape(-1, ch).mean(axis=1) / 32768.0
    mono = mono.astype(np.float32)
    if target_sr and target_sr != sr:
        mono = resample_np(mono, sr, target_sr)
        sr = target_sr
    return mono, sr


def resample_np(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Host-side resample (native if available, else the jnp kernel)."""
    lib = _load_lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib:
        cap = int(np.ceil(len(x) * new_sr / orig_sr)) + 16
        out = np.empty(cap, np.float32)
        n = lib.aio_resample(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(x),
            int(orig_sr),
            int(new_sr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
        )
        return out[:n].copy()
    from ..ops.audio import resample as jresample

    return np.asarray(jresample(x[None], orig_sr, new_sr))[0]


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """data: [T] or [C, T] float32 in [-1, 1] -> PCM16 WAV."""
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None]
    ch, frames = data.shape
    interleaved = np.ascontiguousarray(data.T.reshape(-1))
    lib = _load_lib()
    if lib:
        rc = lib.aio_write_wav(
            str(path).encode(),
            interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frames,
            ch,
            int(sample_rate),
        )
        if rc != 0:
            raise IOError(f"failed to write {path}")
        return
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = (np.clip(interleaved, -1, 1) * 32767.0).astype(np.int16)
        w.writeframes(pcm.tobytes())
