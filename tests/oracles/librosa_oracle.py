"""Independent NumPy oracle for the reference CPU frontend.

Reimplements, in float64 with np.fft, the exact numeric path of the
reference's ``MelSpectrogramLibrosa`` / ``extract_log_mel_spectrogram``
(src/utils/utils.py:20-29,43-49 with librosa==0.8.1):

  - STFT: n_fft=1024, hop=160, periodic Hann, center=True, reflect padding
  - power spectrum |X|^2 + float64 eps
  - Slaney mel filterbank (fmin=60, fmax=7800, area-normalized)
  - + float32 eps, natural log

Deliberately structured differently from audiossl_tpu.frontend (per-filter
loop, np.fft.rfft instead of DFT matmul) so agreement between the two is a
meaningful check.
"""
import numpy as np
import scipy.signal


def _hz_to_mel_slaney(f):
    f = np.atleast_1d(np.asarray(f, dtype=np.float64))
    out = f * 3.0 / 200.0
    log_region = f >= 1000.0
    out[log_region] = 15.0 + np.log(f[log_region] / 1000.0) / (np.log(6.4) / 27.0)
    return out


def _mel_to_hz_slaney(m):
    m = np.atleast_1d(np.asarray(m, dtype=np.float64))
    out = m * 200.0 / 3.0
    log_region = m >= 15.0
    out[log_region] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_region] - 15.0))
    return out


def mel_fb_oracle(sr=16000, n_fft=1024, n_mels=64, fmin=60.0, fmax=7800.0):
    n_freqs = 1 + n_fft // 2
    fft_hz = np.arange(n_freqs) * (sr / 2.0) / (n_freqs - 1)
    edges_mel = np.linspace(_hz_to_mel_slaney(fmin)[0], _hz_to_mel_slaney(fmax)[0], n_mels + 2)
    edges_hz = _mel_to_hz_slaney(edges_mel)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ctr, hi = edges_hz[i], edges_hz[i + 1], edges_hz[i + 2]
        for j, f in enumerate(fft_hz):
            if lo <= f <= ctr and ctr > lo:
                fb[i, j] = (f - lo) / (ctr - lo)
            elif ctr < f <= hi and hi > ctr:
                fb[i, j] = (hi - f) / (hi - ctr)
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb


def stft_oracle(wave, n_fft=1024, hop=160):
    wave = np.asarray(wave, dtype=np.float64)
    window = scipy.signal.get_window("hann", n_fft, fftbins=True)
    padded = np.pad(wave, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(padded) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        out[:, t] = np.fft.rfft(padded[t * hop : t * hop + n_fft] * window)
    return out


def log_mel_oracle(wave, sr=16000, n_fft=1024, hop=160, n_mels=64, fmin=60.0, fmax=7800.0):
    """Replicates extract_log_mel_spectrogram(waveform, MelSpectrogramLibrosa())."""
    X = stft_oracle(wave, n_fft, hop)
    power = np.abs(X) ** 2 + np.finfo(np.float64).eps
    mel = mel_fb_oracle(sr, n_fft, n_mels, fmin, fmax) @ power
    return np.log(mel + np.finfo(np.float32).eps)
