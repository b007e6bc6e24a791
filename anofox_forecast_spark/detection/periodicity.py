"""Periodicity detection: ACF, FFT, Autoperiod, SAZED (+ periodogram utils).

Semantics from ref src/detection/periodicity.rs, fft.rs, sazed.rs (behavior
reproduced; detector outputs are discrete periods validated behaviorally):

- ACF detector (:74-116): local maxima of the ACF over [min_period,
  max_period] above a correlation threshold (default 0.3); harmonic
  filtering prefers the fundamental (a local max whose multiples are also
  maxima wins over the multiples).
- FFT detector (:252-294): periodogram peak ≥ threshold × median power
  (default 3× noise floor), period = round(n/k), within bounds.
- Autoperiod (:361-406, Vlachos 2005): FFT candidate "hills" validated on
  the ACF (candidate valid if it sits on an ACF local maximum within ±1).
- SAZED (sazed.rs:25-42, Toller 2019): parameter-free ensemble —
  spectral-density argmax, ACF argmax, ACF-average, zero-crossing mean
  distance — mode vote with tolerance 1 (defaults min=2, max=365).
- periodogram (fft.rs:48): |FFT|²/n over positive frequencies.
"""

from __future__ import annotations

import numpy as np


def _acf_full(y: np.ndarray, max_lag: int) -> np.ndarray:
    n = y.size
    m = y.mean()
    var = ((y - m) ** 2).sum() / n
    if var < 1e-10:
        return np.zeros(max_lag + 1)
    d = y - m
    out = np.empty(max_lag + 1)
    out[0] = 1.0
    for k in range(1, max_lag + 1):
        out[k] = (d[k:] * d[:-k]).sum() / (n * var) if k < n else 0.0
    return out


def periodogram(y: np.ndarray) -> np.ndarray:
    """|DFT|²/n at frequencies k=0..n/2 (ref fft.rs:48)."""
    n = y.size
    spec = np.fft.rfft(y - y.mean())
    return (spec.real**2 + spec.imag**2) / n


def _local_maxima(x: np.ndarray) -> np.ndarray:
    if x.size < 3:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])) + 1


def acf_detect_period(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int = 365,
    correlation_threshold: float = 0.3,
) -> int | None:
    n = y.size
    max_lag = min(max_period, n // 2)
    if max_lag < min_period:
        return None
    acf = _acf_full(y, max_lag)
    maxima = [
        int(k) for k in _local_maxima(acf)
        if min_period <= k <= max_lag and acf[k] >= correlation_threshold
    ]
    if not maxima:
        return None
    max_set = set(maxima)
    # harmonic filtering: prefer the smallest candidate whose multiples are
    # themselves maxima (the fundamental), else the highest-ACF candidate
    for p in sorted(maxima):
        mult = 2 * p
        if mult <= max_lag and any(abs(m - mult) <= 1 for m in max_set):
            return p
    return max(maxima, key=lambda k: acf[k])


def fft_detect_period(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int = 365,
    threshold: float = 3.0,
) -> int | None:
    n = y.size
    if n < 2 * min_period:
        return None
    psd = periodogram(y)
    if psd.size < 2:
        return None
    noise = np.median(psd[1:])
    best_k, best_p = None, 0.0
    for k in range(1, psd.size):
        period = n / k
        if period < min_period or period > max_period:
            continue
        if psd[k] >= threshold * max(noise, 1e-300) and psd[k] > best_p:
            best_k, best_p = k, psd[k]
    if best_k is None:
        return None
    return int(round(n / best_k))


def autoperiod_detect(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int = 365,
) -> int | None:
    """FFT candidates validated on ACF local maxima (Vlachos 2005)."""
    n = y.size
    psd = periodogram(y)
    if psd.size < 2:
        return None
    noise = np.median(psd[1:])
    cands = []
    for k in range(1, psd.size):
        period = n / k
        if min_period <= period <= min(max_period, n // 2) and psd[k] > 3.0 * max(noise, 1e-300):
            cands.append((psd[k], int(round(period))))
    if not cands:
        return None
    max_lag = min(max_period, n // 2)
    acf = _acf_full(y, max_lag)
    maxima = set(int(k) for k in _local_maxima(acf))
    for _, p in sorted(cands, reverse=True):
        if any(abs(p - m) <= 1 for m in maxima):
            # hill-climb to the exact ACF maximum near the candidate
            near = [m for m in maxima if abs(p - m) <= 1]
            return int(max(near, key=lambda m: acf[m]))
    return None


def sazed_detect(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int = 365,
    tolerance: int = 1,
) -> int | None:
    """Parameter-free ensemble vote (S, ZE, D components; Toller 2019)."""
    n = y.size
    max_lag = min(max_period, n // 2)
    if max_lag < min_period:
        return None
    votes: list[int] = []
    # S: spectral argmax
    p = fft_detect_period(y, min_period, max_period, threshold=1.0)
    if p:
        votes.append(p)
    # A: ACF argmax over valid range
    acf = _acf_full(y, max_lag)
    if max_lag >= min_period:
        k = int(np.argmax(acf[min_period : max_lag + 1])) + min_period
        votes.append(k)
    # AA: ACF local-maxima mean spacing
    maxima = [int(k) for k in _local_maxima(acf) if k >= min_period]
    if len(maxima) >= 2:
        votes.append(int(round(float(np.mean(np.diff(maxima))))))
    elif len(maxima) == 1:
        votes.append(maxima[0])
    # ZE: mean distance between zero crossings of the centered series ×2
    d = y - y.mean()
    sign_change = np.flatnonzero(np.diff(np.signbit(d)))
    if sign_change.size >= 2:
        votes.append(int(round(2.0 * float(np.mean(np.diff(sign_change))))))
    votes = [v for v in votes if min_period <= v <= max_period]
    if not votes:
        return None
    # mode voting with ±tolerance clustering
    best_v, best_count = None, 0
    for v in votes:
        c = sum(1 for w in votes if abs(w - v) <= tolerance)
        if c > best_count:
            best_v, best_count = v, c
    return best_v


def detect_period(y: np.ndarray, method: str = "sazed", **kwargs) -> int | None:
    """Convenience wrapper (ref periodicity.rs:788-793)."""
    fn = {
        "acf": acf_detect_period,
        "fft": fft_detect_period,
        "autoperiod": autoperiod_detect,
        "sazed": sazed_detect,
    }[method]
    return fn(y, **kwargs)


def welch_periodogram(y: np.ndarray, window_size: int = 64, overlap: float = 0.5) -> np.ndarray:
    """Welch-averaged PSD with Hann windows (ref fft.rs:147-190).

    Returns averaged PSD at frequencies k=0..window_size/2.
    """
    n = y.size
    if n < window_size or window_size < 4:
        return periodogram(y)
    overlap = min(max(overlap, 0.0), 0.9)
    hop = max(int(np.ceil((1.0 - overlap) * window_size)), 1)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(window_size) / window_size))
    acc = None
    count = 0
    start = 0
    while start + window_size <= n:
        seg = y[start : start + window_size] * hann
        spec = np.fft.rfft(seg - seg.mean())
        psd = (spec.real**2 + spec.imag**2) / window_size
        acc = psd if acc is None else acc + psd
        count += 1
        start += hop
    return acc / count if count else periodogram(y)


def cfd_autoperiod_detect(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int = 365,
) -> int | None:
    """CFD-Autoperiod (Puech 2020): detrend, cluster FFT candidate hills,
    validate the clustered candidates on the ACF (noise-resistant variant
    of Autoperiod; ref src/detection/periodicity.rs:588-640 behavior)."""
    n = y.size
    if n < 2 * min_period:
        return None
    # linear detrend (the CFD step that kills spectral leakage from trend)
    x = np.arange(n, dtype=np.float64)
    slope = ((x - x.mean()) * (y - y.mean())).sum() / max(((x - x.mean()) ** 2).sum(), 1e-300)
    det = y - (y.mean() + slope * (x - x.mean()))
    psd = periodogram(det)
    if psd.size < 2:
        return None
    noise = np.median(psd[1:])
    # relative-power floor: with one dominant frequency the 3x-median test
    # passes hundreds of noise bins — require 5% of the global peak too
    floor = max(3.0 * max(noise, 1e-300), 0.05 * float(psd[1:].max()))
    cands = []
    for k in range(1, psd.size):
        period = n / k
        if min_period <= period <= min(max_period, n // 2) and psd[k] > floor:
            cands.append((int(round(period)), psd[k]))
    if not cands:
        return None
    # cluster nearby candidate periods (within 20%), keep cluster power sums
    cands.sort()
    clusters: list[list[tuple[int, float]]] = [[cands[0]]]
    for p, pw in cands[1:]:
        if p <= clusters[-1][-1][0] * 1.2:
            clusters[-1].append((p, pw))
        else:
            clusters.append([(p, pw)])
    ranked = sorted(
        ((max(pw for _, pw in cl), int(round(np.mean([p for p, _ in cl])))) for cl in clusters),
        reverse=True,
    )
    max_lag = min(max_period, n // 2)
    acf = _acf_full(det, max_lag)
    maxima = set(int(k) for k in _local_maxima(acf))
    validated = []
    for _, p in ranked:
        near = [m for m in maxima if abs(p - m) <= max(1, p // 10)]
        if near:
            validated.append(int(max(near, key=lambda m: acf[m])))
    if not validated:
        return None
    # fundamental preference: a pure period-p signal validates every multiple
    # of p too — return the smallest validated period
    return min(validated)
