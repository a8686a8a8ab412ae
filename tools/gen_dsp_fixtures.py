"""Generate golden DSP fixtures from librosa's PUBLISHED closed-form formulas.

librosa itself is not installable in this image, so ground truth is derived
here by an INDEPENDENT scalar implementation of the documented math (Slaney
mel scale as in librosa.filters.mel / Slaney's Auditory Toolbox; orthonormal
DCT-II as in scipy.fft.dct(norm="ortho")), written loop-by-loop rather than
vectorized so it shares no code with `tcdiff_tpu/data/audio.py`. The printed
literals are embedded in tests/test_dsp_golden.py; this script is kept so
the derivation is auditable and regenerable.

Run: python tools/gen_dsp_fixtures.py
"""

import math

import numpy as np

SR = 30720
N_FFT = 2048
N_MELS = 128


def hz_to_mel_scalar(f: float) -> float:
    # Slaney: linear below 1 kHz (200/3 Hz per mel), log above
    # (librosa.core.convert.hz_to_mel, htk=False)
    f_sp = 200.0 / 3.0
    if f < 1000.0:
        return f / f_sp
    return 1000.0 / f_sp + math.log(f / 1000.0) / (math.log(6.4) / 27.0)


def mel_to_hz_scalar(m: float) -> float:
    f_sp = 200.0 / 3.0
    if m < 1000.0 / f_sp:
        return m * f_sp
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - 1000.0 / f_sp))


def mel_fb_scalar(sr=SR, n_fft=N_FFT, n_mels=N_MELS):
    """Triangular slaney-normalized filterbank, scalar loops."""
    n_bins = 1 + n_fft // 2
    fft_f = [sr / 2.0 * i / (n_bins - 1) for i in range(n_bins)]
    lo, hi = hz_to_mel_scalar(0.0), hz_to_mel_scalar(sr / 2.0)
    mel_pts = [mel_to_hz_scalar(lo + (hi - lo) * i / (n_mels + 1)) for i in range(n_mels + 2)]
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        f_lo, f_c, f_hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        enorm = 2.0 / (f_hi - f_lo)
        for j in range(n_bins):
            f = fft_f[j]
            lower = (f - f_lo) / (f_c - f_lo)
            upper = (f_hi - f) / (f_hi - f_c)
            fb[i, j] = max(0.0, min(lower, upper)) * enorm
    return fb


def dct2_ortho_scalar(N: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, closed form:
    M[k,n] = s_k * cos(pi*k*(2n+1)/(2N)), s_0 = sqrt(1/N), s_k = sqrt(2/N)."""
    M = np.zeros((N, N))
    for k in range(N):
        s = math.sqrt((1.0 if k == 0 else 2.0) / N)
        for n in range(N):
            M[k, n] = s * math.cos(math.pi * k * (2 * n + 1) / (2 * N))
    return M


def main():
    np.set_printoptions(precision=17)
    fb = mel_fb_scalar()

    # fixture 1: mel breakpoint frequencies (every 16th of the 130 points)
    lo, hi = hz_to_mel_scalar(0.0), hz_to_mel_scalar(SR / 2.0)
    pts = [mel_to_hz_scalar(lo + (hi - lo) * i / (N_MELS + 1)) for i in range(N_MELS + 2)]
    print("MEL_BREAKPOINTS_EVERY16 =", repr([round(pts[i], 10) for i in range(0, 130, 16)]))

    # fixture 2: nonzero segments of three filter rows
    for row in (0, 64, 127):
        nz = np.nonzero(fb[row])[0]
        seg = fb[row, nz[0] : nz[-1] + 1]
        print(f"MEL_ROW{row}_START = {nz[0]}")
        print(f"MEL_ROW{row}_VALS = {[float(f'{v:.12e}') for v in seg]}")

    # fixture 3: full-matrix invariants
    print("MEL_FB_SUM =", repr(float(fb.sum())))
    print("MEL_FB_NNZ =", int((fb > 0).sum()))

    # fixture 4: DCT-II orthonormal first column / known entries
    M = dct2_ortho_scalar(8)
    print("DCT8_ORTHO =", repr([[float(f"{v:.12e}") for v in r] for r in M]))


if __name__ == "__main__":
    main()
