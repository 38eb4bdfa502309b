"""Independent NumPy oracle for the Kaldi-compatible fbank
(torchaudio.compliance.kaldi.fbank semantics, implemented per-frame with
np.fft, structured differently from audiossl_tpu.frontend.fbank)."""
import numpy as np


def kaldi_fbank_oracle(
    wave,
    sr=16000,
    num_mel_bins=128,
    frame_length_ms=25.0,
    frame_shift_ms=10.0,
    preemphasis=0.97,
    remove_dc=True,
    low_freq=20.0,
    high_freq=0.0,
):
    wave = np.asarray(wave, dtype=np.float64)
    ws = int(sr * frame_length_ms / 1000)
    shift = int(sr * frame_shift_ms / 1000)
    nfft = 1
    while nfft < ws:
        nfft *= 2
    if high_freq <= 0:
        high_freq = sr / 2.0 + high_freq

    n_frames = 0 if len(wave) < ws else 1 + (len(wave) - ws) // shift
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ws) / (ws - 1))

    # mel banks, Kaldi formulation (triangles in mel space on fft-bin freqs)
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    delta = (mel(high_freq) - mel(low_freq)) / (num_mel_bins + 1)
    banks = np.zeros((num_mel_bins, nfft // 2 + 1))
    for b in range(num_mel_bins):
        l = mel(low_freq) + b * delta
        c = l + delta
        r = c + delta
        for k in range(nfft // 2):  # Nyquist column stays zero
            mk = mel(sr / nfft * k)
            if l < mk < r:
                banks[b, k] = (mk - l) / delta if mk <= c else (r - mk) / delta

    out = np.zeros((n_frames, num_mel_bins))
    for t in range(n_frames):
        fr = wave[t * shift : t * shift + ws].copy()
        if remove_dc:
            fr -= fr.mean()
        if preemphasis:
            fr = np.concatenate([[fr[0] - preemphasis * fr[0]], fr[1:] - preemphasis * fr[:-1]])
        fr = fr * window
        spec = np.fft.rfft(fr, n=nfft)
        power = np.abs(spec) ** 2
        melE = banks @ power
        out[t] = np.log(np.maximum(melE, np.finfo(np.float32).eps))
    return out
