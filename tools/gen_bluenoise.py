"""Generate the blue-noise Cranley-Patterson shift table (void-and-cluster).

Reference analog: the tiled multijitter/blue-noise shift tables the
reference ships as binary assets (src/tiled_sampling.h:287,312 +
vs/fermat/samples-*.dat). Those are data files of unknown provenance; this
tool GENERATES an equivalent table from scratch with Ulichney's
void-and-cluster method (toroidal Gaussian energy), deterministic seed, and
writes fermat_tpu/data/bluenoise64.npz (two independent 64x64 channels —
one per component of a 2D shift vector).

Spectral property (asserted below + tests/test_bluenoise.py): the rank
image's DFT has near-zero energy at low frequencies — dithering pixel
sample offsets with it pushes estimator error to high frequencies where
human vision (and denoisers) attenuate it, vs the white per-pixel
decorrelation of Owen scrambling.

Run: python tools/gen_bluenoise.py   (~10 s; overwrites the npz)
"""
import os
import sys

import numpy as np

K = 64  # table side
SIGMA = 1.9  # Ulichney's recommended Gaussian sigma (pixels)


def _energy_kernel(k: int, sigma: float) -> np.ndarray:
    ax = np.arange(k)
    d = np.minimum(ax, k - ax).astype(np.float64)  # toroidal distance
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma))


def _filt(binary: np.ndarray, kf: np.ndarray) -> np.ndarray:
    """Toroidal convolution of the binary pattern with the energy kernel."""
    return np.real(np.fft.ifft2(np.fft.fft2(binary) * kf))


def void_and_cluster(k: int = K, sigma: float = SIGMA, frac: float = 0.1,
                     seed: int = 0) -> np.ndarray:
    """Full-rank blue-noise matrix in [0, 1) (Ulichney 1993, 3 phases)."""
    rng = np.random.default_rng(seed)
    n = k * k
    kf = np.fft.fft2(np.fft.ifftshift(_energy_kernel(k, sigma)))
    kf = np.fft.fft2(_energy_kernel(k, sigma))  # kernel is already centered at (0,0) torus-wise

    # initial binary pattern: random minority points, then swap tightest
    # cluster -> largest void until a fixed point
    ones = int(n * frac)
    bp = np.zeros(n, np.float64)
    bp[rng.choice(n, ones, replace=False)] = 1.0
    bp = bp.reshape(k, k)
    for _ in range(4 * n):
        e = _filt(bp, kf)
        cl = np.unravel_index(np.argmax(np.where(bp > 0.5, e, -np.inf)), bp.shape)
        bp[cl] = 0.0
        e = _filt(bp, kf)
        vd = np.unravel_index(np.argmin(np.where(bp < 0.5, e, np.inf)), bp.shape)
        if vd == cl:
            bp[cl] = 1.0
            break
        bp[vd] = 1.0

    rank = np.full((k, k), -1, np.int64)

    # phase 1: peel the initial pattern tightest-cluster-first
    b = bp.copy()
    for r in range(ones - 1, -1, -1):
        e = _filt(b, kf)
        cl = np.unravel_index(np.argmax(np.where(b > 0.5, e, -np.inf)), b.shape)
        b[cl] = 0.0
        rank[cl] = r

    # phase 2 + 3: fill largest-void-first up to full rank
    b = bp.copy()
    for r in range(ones, n):
        e = _filt(b, kf)
        vd = np.unravel_index(np.argmin(np.where(b < 0.5, e, np.inf)), b.shape)
        b[vd] = 1.0
        rank[vd] = r

    assert (rank >= 0).all() and len(np.unique(rank)) == n
    # rank -> uniform shift in [0, 1) (add 1/2n to center the strata)
    return ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)


def low_freq_energy_ratio(m: np.ndarray, cutoff: float = 0.15) -> float:
    """Fraction of non-DC spectral energy below `cutoff` * Nyquist."""
    f = np.abs(np.fft.fft2(m - m.mean())) ** 2
    k = m.shape[0]
    fx = np.minimum(np.arange(k), k - np.arange(k)) / (k / 2)
    r = np.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
    tot = f.sum()
    return float(f[r < cutoff].sum() / max(tot, 1e-30))


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fermat_tpu", "data")
    os.makedirs(out_dir, exist_ok=True)
    ch0 = void_and_cluster(seed=17)
    ch1 = void_and_cluster(seed=41)
    for name, ch in (("ch0", ch0), ("ch1", ch1)):
        lo = low_freq_energy_ratio(ch)
        rng = np.random.default_rng(7)
        white = low_freq_energy_ratio(rng.random((K, K)).astype(np.float32))
        print(f"{name}: low-freq energy {lo:.4f} vs white {white:.4f}")
        assert lo < 0.3 * white, "table is not blue"
    path = os.path.join(out_dir, "bluenoise64.npz")
    np.savez_compressed(path, shift=np.stack([ch0, ch1], axis=-1),
                        sigma=SIGMA, method="void-and-cluster")
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
