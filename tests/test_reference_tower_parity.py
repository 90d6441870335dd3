"""Executed numeric parity of the CLAP AUDIO TOWERS against the ACTUAL
vendored reference code (VERDICT r3 next #6).

`tests/test_reference_parity.py` executes the reference stage transformer;
this file does the same for the towers: it imports the vendored
`/root/reference/open_musiclm/laion_clap/clap_module/{htsat,pann_model}.py`
(reference htsat.py:599-980, pann_model.py:146-543), random-inits the torch
models, converts their state dicts through ``import_htsat``/``import_pann``,
and asserts embedding/clipwise parity on the same waveforms.

torchlibrosa is not installed in this image, so its two frontend classes are
shimmed with the SAME math (torch.stft power spectrogram: hann periodic,
center, reflect pad; librosa slaney mel + power_to_db ref=1 amin=1e-10
top_db=None).  The shim formulas are independently validated by
`test_clap.py::test_stft_matches_torch` and
`::test_mel_filterbank_matches_librosa_formula`, so everything DOWNSTREAM of
the spectrogram — bn0, reshape_wav2img folding, the full Swin/CNN stack,
tscam head, pooling — is the reference's own executed code.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_musiclm_tpu.import_torch import import_htsat, import_pann  # noqa: E402
from open_musiclm_tpu.models.clap.htsat import HTSAT, HTSATConfig  # noqa: E402
from open_musiclm_tpu.models.clap.pann import PANN  # noqa: E402
from open_musiclm_tpu.testing import TINY_AUDIO  # noqa: E402

REF_CLAP_PATH = "/root/reference/open_musiclm/laion_clap/clap_module"
REF_PKG = "refclap"


def _install_tower_stubs():
    """Stand-ins for deps absent from this image (torchlibrosa, torchvision).

    The torchlibrosa shim is math-real, not a mock — see module docstring.
    """
    if "torchlibrosa" not in sys.modules:
        from torch import nn

        from open_musiclm_tpu.models.clap.mel import mel_filterbank

        class Spectrogram(nn.Module):
            def __init__(self, n_fft, hop_length, win_length, window="hann",
                         center=True, pad_mode="reflect", power=2.0,
                         freeze_parameters=True):
                super().__init__()
                assert window == "hann" and center and pad_mode == "reflect"
                self.n_fft, self.hop, self.win = n_fft, hop_length, win_length

            def forward(self, x):
                spec = torch.stft(
                    x, self.n_fft, self.hop, self.win,
                    window=torch.hann_window(self.win, dtype=x.dtype),
                    center=True, pad_mode="reflect",
                    return_complex=True, onesided=True,
                )  # [B, F, T]
                power = spec.real ** 2 + spec.imag ** 2
                return power.transpose(1, 2)[:, None]  # [B, 1, T, F]

        class LogmelFilterBank(nn.Module):
            def __init__(self, sr, n_fft, n_mels, fmin, fmax, ref=1.0,
                         amin=1e-10, top_db=None, freeze_parameters=True):
                super().__init__()
                assert top_db is None
                self.amin, self.ref = amin, ref
                self.register_buffer(
                    "melW",
                    torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, fmin, fmax)),
                )

            def forward(self, x):
                mel = torch.matmul(x, self.melW.to(x.dtype))
                log_spec = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
                return log_spec - 10.0 * float(np.log10(max(self.amin, self.ref)))

        class SpecAugmentation(nn.Module):
            """Training-only in the reference (htsat.py forward gates on
            `self.training`); these parity tests run eval() so a no-op is
            exact."""

            def __init__(self, **kw):
                super().__init__()

            def forward(self, x):
                return x

        tl = types.ModuleType("torchlibrosa")
        tls = types.ModuleType("torchlibrosa.stft")
        tls.Spectrogram = Spectrogram
        tls.LogmelFilterBank = LogmelFilterBank
        tla = types.ModuleType("torchlibrosa.augmentation")
        tla.SpecAugmentation = SpecAugmentation
        tl.stft, tl.augmentation = tls, tla
        sys.modules.update(
            {"torchlibrosa": tl, "torchlibrosa.stft": tls,
             "torchlibrosa.augmentation": tla}
        )
    if "torchvision" not in sys.modules:
        # clap_module/utils.py imports FrozenBatchNorm2d (unused on the
        # tower forward path)
        from torch import nn

        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        misc = types.ModuleType("torchvision.ops.misc")
        misc.FrozenBatchNorm2d = nn.BatchNorm2d
        ops.misc = misc
        tv.ops = ops
        sys.modules.update(
            {"torchvision": tv, "torchvision.ops": ops,
             "torchvision.ops.misc": misc}
        )


def load_ref_module(name: str):
    """Import one vendored clap_module file as ``refclap.<name>`` without
    running the package __init__ (which pulls the whole factory surface)."""
    _install_tower_stubs()
    if REF_PKG not in sys.modules:
        spec = importlib.machinery.ModuleSpec(REF_PKG, None, is_package=True)
        pkg = importlib.util.module_from_spec(spec)
        pkg.__path__ = [REF_CLAP_PATH]
        sys.modules[REF_PKG] = pkg
    return importlib.import_module(f"{REF_PKG}.{name}")


def _wave(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    return (0.2 * rng.standard_normal((batch, n))).astype(np.float32)


# ---------------------------------------------------------------------------
# HTSAT
# ---------------------------------------------------------------------------


def _ref_htsat(cfg: HTSATConfig):
    """Reference HTSAT_Swin_Transformer at the geometry of our config."""
    ref = load_ref_module("htsat")
    frontend = types.SimpleNamespace(
        sample_rate=cfg.sample_rate,
        window_size=cfg.window_size_fft,
        hop_size=cfg.hop_size,
        mel_bins=cfg.mel_bins,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
    )
    model = ref.HTSAT_Swin_Transformer(
        spec_size=cfg.spec_size,
        patch_size=cfg.patch_size,
        patch_stride=tuple(cfg.patch_stride),
        num_classes=cfg.num_classes,
        embed_dim=cfg.embed_dim,
        depths=list(cfg.depths),
        num_heads=list(cfg.num_heads),
        window_size=cfg.window_size,
        config=frontend,
        enable_fusion=False,
    )
    model.eval()
    return model


def _htsat_parity(cfg: HTSATConfig, wave: np.ndarray, atol: float):
    t_model = _ref_htsat(cfg)
    with torch.no_grad():
        ref_out = t_model({"waveform": torch.from_numpy(wave)})
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    variables = import_htsat(sd, cfg)

    j_out = HTSAT(cfg).apply(variables, jnp.asarray(wave), train=False)

    for key in ("embedding", "clipwise_output"):
        np.testing.assert_allclose(
            np.asarray(j_out[key], np.float32),
            ref_out[key].numpy(),
            atol=atol,
            rtol=1e-4,
            err_msg=f"HTSAT {key} diverged from executed reference code",
        )


def test_htsat_executed_parity_tiny_geometry():
    """Doll-house Swin geometry (2 stages, shifted windows, patch merge,
    tscam head) vs the executed reference tower."""
    _htsat_parity(TINY_AUDIO, _wave(2, TINY_AUDIO.clip_samples), atol=2e-4)


def test_htsat_executed_parity_interpolated_frames():
    """Shorter clip -> frames < spec_size*freq_ratio -> the reference's
    align-corners bicubic interpolate path (htsat.py:833-848) vs ours."""
    n = TINY_AUDIO.clip_samples - 1200  # 98 frames -> interpolate to 128
    _htsat_parity(TINY_AUDIO, _wave(1, n, seed=3), atol=2e-4)


def test_htsat_executed_parity_full_checkpoint_geometry():
    """The REAL shipped HTSAT-tiny geometry (spec 256, embed 96, depths
    [2,2,6,2], heads [4,8,16,32], window 8, 64 mels, 10 s @ 48 kHz ->
    1001 frames -> bicubic to 1024) — the exact create_htsat_model('tiny')
    instantiation every shipped MusicLM config loads (reference
    htsat.py:981-1000, model.py:464-470)."""
    cfg = HTSATConfig()  # defaults ARE HTSAT-tiny
    _htsat_parity(cfg, _wave(1, cfg.clip_samples, seed=1), atol=5e-4)


# ---------------------------------------------------------------------------
# PANN
# ---------------------------------------------------------------------------

# bn0 in the reference is BatchNorm2d(64) regardless of config, so mel_bins
# must be 64; shrink time instead (1 s @ 8 kHz, hop 80 -> 101 frames)
_PANN_KW = dict(
    sample_rate=8000,
    window_size_fft=256,
    hop_size=80,
    mel_bins=64,
    fmin=50.0,
    fmax=3500.0,
    num_classes=10,
)


@pytest.mark.parametrize("arch", ["Cnn6", "Cnn10", "Cnn14"])
def test_pann_executed_parity(arch):
    ref = load_ref_module("pann_model")
    t_model = getattr(ref, arch)(
        sample_rate=_PANN_KW["sample_rate"],
        window_size=_PANN_KW["window_size_fft"],
        hop_size=_PANN_KW["hop_size"],
        mel_bins=_PANN_KW["mel_bins"],
        fmin=_PANN_KW["fmin"],
        fmax=_PANN_KW["fmax"],
        classes_num=_PANN_KW["num_classes"],
    )
    t_model.eval()
    wave = _wave(2, 8000, seed=2)
    # Cnn14 takes the CLAP dict protocol; Cnn6/Cnn10 take a raw waveform
    # tensor (reference pann_model.py:480 vs :228)
    t_in = {"waveform": torch.from_numpy(wave)} if arch == "Cnn14" else torch.from_numpy(wave)
    with torch.no_grad():
        ref_out = t_model(t_in)

    j_model = PANN(arch=arch, **_PANN_KW)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    variables = import_pann(sd, j_model)
    j_out = j_model.apply(variables, jnp.asarray(wave), train=False)

    for key in ("embedding", "clipwise_output"):
        np.testing.assert_allclose(
            np.asarray(j_out[key], np.float32),
            ref_out[key].numpy(),
            atol=3e-4,
            rtol=1e-4,
            err_msg=f"PANN {arch} {key} diverged from executed reference code",
        )
