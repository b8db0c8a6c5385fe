"""Real FLAC codec (round 5): from-spec decoder in
dataflow_geobeam_spark/flac vs the independent encoder + per-sample
mirror in fixtures/independent. FLAC is lossless, so every roundtrip
must be bit-exact; malformation must surface as FlacDecodeError /
ValueError only (the decode kernels map that to invalid rows)."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_geobeam_spark import flac as F
from dataflow_geobeam_spark.fixtures import independent as ind


def _tone(n: int, seed: int = 0) -> np.ndarray:
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    x = 3000 * np.sin(t / 30) + 200 * np.sin(t / 7) + rng.normal(0, 20, n)
    return np.clip(np.round(x), -32768, 32767).astype(np.int16)


def _check(x, sr=16000, **kw):
    buf = ind.flac_bytes(x, sr, **kw)
    s_eng, sr_e, bps = F.decode_flac(buf)
    s_ind, sr_i = ind.decode_flac_independent(buf)
    want = np.asarray(x, dtype=np.int32)
    if want.ndim == 1:
        want = want[:, None]
    assert sr_e == sr and sr_i == sr and bps == 16
    assert np.array_equal(s_eng, want), kw
    assert np.array_equal(s_ind.astype(np.int32), want), kw
    return buf


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"blocksize": 192},
        {"blocksize": 1000},
        {"blocksize": 1000, "partition_order": 2},
        {"partition_order": 2},
    ],
    ids=["bs4096", "bs192", "bs1000", "bs1000_po2", "po2"],
)
def test_flac_roundtrip_mono_variants(kw):
    for n, seed in [(1, 1), (2, 2), (191, 3), (4096, 4), (20000, 5)]:
        _check(_tone(n, seed), **kw)


def test_flac_roundtrip_content_regimes():
    rng = np.random.default_rng(7)
    _check(np.full(5000, -123, dtype=np.int16))  # CONSTANT subframes
    _check(rng.integers(-32768, 32768, 9000).astype(np.int16))  # noise/escapes
    _check(np.array([-32768, 32767], dtype=np.int16))  # extremes, VERBATIM
    buf = _check(_tone(20000))
    assert len(buf) < 2 * 20000 * 0.6  # actually compresses tonal content


def test_flac_roundtrip_stereo_modes():
    left = _tone(8000, 11)
    right = np.round(left.astype(np.float64) * 0.7).astype(np.int16)
    st = np.stack([left, right], axis=1)
    _check(st)  # independent channels
    _check(st, stereo_mode="leftside")  # decorrelated side channel (bps+1)


def test_flac_partition_order_clamped_on_short_final_frame():
    """RFC 9639: blocksize must divide by 2^partition_order. A 1000-sample
    blocksize with a 250-sample final frame cannot keep order 2 unless
    250 % 4 == 0 — the encoder must clamp per frame (this exact shape
    silently corrupted the first fixture cut: the engine rejected what a
    lenient mirror mis-decoded)."""
    x = _tone(1250, 13)  # final frame 250 samples, 250 % 4 != 0... (250%4=2)
    _check(x, blocksize=1000, partition_order=2)
    x2 = _tone(1001, 17)  # final frame of ONE sample
    _check(x2, blocksize=1000, partition_order=2)


def test_flac_rejects_malformed_and_fuzz_clean():
    buf = bytearray(_check(_tone(6000, 19), blocksize=1000))
    rng = np.random.default_rng(23)
    # truncations
    for cut in range(4, len(buf) - 1, 97):
        with pytest.raises(ValueError):
            F.decode_flac(bytes(buf[:cut]))
    # CRC actually verified: flip one bit mid-frame
    mid = len(buf) // 2
    flipped = bytes(buf[:mid]) + bytes([buf[mid] ^ 0x10]) + bytes(buf[mid + 1 :])
    with pytest.raises(ValueError):
        F.decode_flac(flipped)
    # mutation fuzz: only FlacDecodeError (a ValueError) may escape
    for t in range(400):
        m = bytearray(buf)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            F.decode_flac(bytes(m))
        except ValueError:
            pass


def test_flac_fixture_goldens_agree_with_engine():
    """Every decodable fixture clip: engine decode == mirror decode
    sample-for-sample; truncated rows rejected by BOTH sides."""
    import pyarrow.parquet as pq

    from dataflow_geobeam_spark.fixtures.generate import ensure_flac_clips

    t = pq.read_table(ensure_flac_clips("/root/testdata/sf0.01"))
    n_ok = n_bad = 0
    for buf in t.column("bytes").to_pylist():
        b = bytes(buf)
        try:
            s_eng = F.decode_flac(b)[0]
        except ValueError:
            with pytest.raises(ValueError):
                ind.decode_flac_independent(b)
            n_bad += 1
            continue
        s_ind = ind.decode_flac_independent(b)[0]
        assert np.array_equal(s_eng, s_ind.astype(np.int32))
        n_ok += 1
    assert n_ok >= 40 and n_bad >= 2  # both regimes present in the corpus


def test_sniffed_decode_all_containers_and_rejects_garbage():
    """codecs.decode_sniffed: label-free dispatch across every container
    the engine decodes; unknown magic and truncation raise ValueError."""
    from dataflow_geobeam_spark import codecs

    rng = np.random.default_rng(31)
    pcm16 = _tone(4000, 29)
    pcm_f = pcm16.astype(np.float64) / 32767.0
    payloads = {
        "wav": codecs.encode_wav(pcm_f, 16000),
        "flac": ind.flac_bytes(pcm16, 16000),
        "aiff": ind.aiff_bytes(pcm16, 22050),
        "au": ind.au_bytes(pcm16, 8000),
        "ogg": ind.encode_standin(pcm_f, 16000, "ogg"),
        "mp3": ind.encode_standin(pcm_f, 16000, "mp3"),
    }
    for want, buf in payloads.items():
        pcm, sr, cont = codecs.decode_sniffed(buf)
        assert cont == want
        assert sr in (8000, 16000, 22050)
        assert pcm.dtype == np.float32 and pcm.ndim == 1 and len(pcm) > 0
        with pytest.raises(ValueError):
            codecs.decode_sniffed(buf[: len(buf) // 3])
    with pytest.raises(ValueError):
        codecs.decode_sniffed(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))


def test_aiff_extended_float_rates_roundtrip():
    """The 80-bit extended-float COMM rate must survive encode->decode for
    every rate the fixtures use plus awkward ones (non-power-of-two,
    odd)."""
    from dataflow_geobeam_spark import codecs

    x = _tone(256, 41)
    for sr in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 12345):
        buf = ind.aiff_bytes(x, sr)
        _, got = codecs.decode_aiff(buf)
        _, got_i = ind.decode_aiff_independent(buf)
        assert got == sr and got_i == sr


def test_sniffed_decode_mutation_fuzz_valueerror_only():
    """decode_sniffed's documented contract: any malformed payload raises
    ValueError (nothing else escapes to the caller). Mutation fuzz across
    every container family."""
    from dataflow_geobeam_spark import codecs

    rng = np.random.default_rng(53)
    pcm16 = _tone(2000, 47)
    pcm_f = pcm16.astype(np.float64) / 32767.0
    payloads = [
        codecs.encode_wav(pcm_f, 16000),
        ind.flac_bytes(pcm16, 16000, blocksize=1000),
        ind.aiff_bytes(pcm16, 22050),
        ind.au_bytes(pcm16, 8000),
        ind.encode_standin(pcm_f, 16000, "ogg"),
    ]
    for buf in payloads:
        arr = bytearray(buf)
        for t in range(250):
            m = bytearray(arr)
            for _ in range(int(rng.integers(1, 4))):
                m[int(rng.integers(0, len(arr)))] = int(rng.integers(0, 256))
            cut = len(arr) if t % 2 else int(rng.integers(4, len(arr)))
            try:
                pcm, sr, cont = codecs.decode_sniffed(bytes(m[:cut]))
                assert pcm.ndim == 1 and sr > 0 and isinstance(cont, str)
            except ValueError:
                pass  # the only permitted failure mode
