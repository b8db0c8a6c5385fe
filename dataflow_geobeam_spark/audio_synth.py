"""Deterministic per-clip PCM synthesis (seeded sum-of-sines + noise).

Every clip's waveform is a pure function of its integer index ``i`` and the
global seed, so fixtures regenerate bit-identically on any machine — the
in-repo analog of the reference's fixed public GCS fixtures
(``/root/reference/cloudbuild.yaml:63-89``).
"""

from __future__ import annotations

import numpy as np

SEED = 42


def synth_pcm(i: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Render clip ``i``: 3 seeded sines + Gaussian noise, amplitude <= 0.8.

    Clips with ``i % 5 == 2`` carry 1-2 internal SILENCE GAPS (the sines
    are zeroed over seeded spans; the noise floor stays) — real speech
    pauses, so VAD-style segmentation sees multi-segment clips in the
    fixture corpus itself, not just in hand-built unit tests. Gap spans
    draw from the same per-clip rng AFTER the tone draws, keeping the
    tonal content of every clip identical to the ungapped variant.

    Returns float32 PCM in [-1, 1], length ``round(sr_hz * dur_ms / 1000)``.
    """
    n = int(round(sr_hz * dur_ms / 1000.0))
    rng = np.random.default_rng([SEED, i])
    t = np.arange(n, dtype=np.float64) / float(sr_hz)
    pcm = np.zeros(n, dtype=np.float64)
    for k in range(3):
        freq = 80.0 + float(rng.integers(0, 3000))
        phase = float(rng.uniform(0.0, 2.0 * np.pi))
        amp = 0.15 + 0.1 * float(rng.uniform())
        pcm += amp * np.sin(2.0 * np.pi * freq * t + phase)
    if i % 5 == 2 and n > 0:
        for _ in range(1 + int(rng.integers(0, 2))):
            g0 = float(rng.uniform(0.15, 0.65))
            glen = float(rng.uniform(0.12, 0.28))
            pcm[int(g0 * n) : int(min(g0 + glen, 0.9) * n)] = 0.0
    pcm += 0.02 * rng.standard_normal(n)
    peak = np.max(np.abs(pcm)) if n else 1.0
    if peak > 0:
        pcm *= 0.8 / max(peak, 0.8)
    return np.clip(pcm, -1.0, 1.0).astype(np.float32)


def pcm_metrics(pcm: np.ndarray) -> tuple[int, float, float]:
    """(n_samples, rms, peak) computed in float64 — reference formula.

    Round-3: no longer shared between engine and oracle. The engine's
    decode UDF inlines this arithmetic (functions/decode.py) and the
    fixture oracle reimplements it (fixtures/independent.py: metrics), so
    the two sides can no longer share a kernel bug; this copy remains the
    test-suite reference both are checked against.
    """
    n = int(pcm.shape[0])
    if n == 0:
        return 0, 0.0, 0.0
    x = pcm.astype(np.float64)
    return n, float(np.sqrt(np.mean(x * x))), float(np.max(np.abs(x)))


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio in dB of ``test`` against reference PCM."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    if ref.shape != test.shape:
        return float("-inf")
    noise = np.sum((ref - test) ** 2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(np.sum(ref**2) / noise))
