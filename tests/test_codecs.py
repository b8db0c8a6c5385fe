"""Unit tests: codec encode/decode roundtrips, SNR invariant, failure modes.

Upgrades the reference's unasserted pipeline-as-test scripts
(``/root/reference/test/rasterblocksource_test.py``) to asserted units per
SURVEY.md §5.
"""

import numpy as np
import pytest

from dataflow_geobeam_spark import codecs
from dataflow_geobeam_spark.audio_synth import pcm_metrics, snr_db, synth_pcm


@pytest.mark.parametrize("codec", codecs.KNOWN_CODECS)
@pytest.mark.parametrize("sr_hz", [8000, 44100])
def test_roundtrip_snr(codec, sr_hz):
    pcm = synth_pcm(11, sr_hz, 400)
    buf = codecs.encode(pcm, sr_hz, codec)
    dec, sr = codecs.decode(buf, codec)
    assert sr == sr_hz
    assert dec.shape == pcm.shape
    assert dec.dtype == np.float32
    # per-row invariant from BASELINE.json input_hint: SNR >= 30 dB
    assert snr_db(pcm, dec) >= 30.0


def test_wav_lossless_roundtrip_is_quantization_only():
    pcm = synth_pcm(3, 16000, 300)
    dec, _ = codecs.decode(codecs.encode(pcm, 16000, "wav"), "wav")
    # wav is PCM16: error bounded by one quantization step
    assert np.max(np.abs(dec - pcm)) <= 1.0 / 32767 + 1e-7


def test_decode_rejects_unknown_codec():
    buf = codecs.encode(synth_pcm(1, 8000, 250), 8000, "wav")
    with pytest.raises(ValueError):
        codecs.decode(buf, "unknown")


def test_decode_rejects_truncated_wav():
    buf = codecs.encode(synth_pcm(2, 8000, 250), 8000, "wav")
    with pytest.raises(ValueError):
        codecs.decode(buf[: len(buf) // 3], "wav")


def test_decode_rejects_none_and_garbage():
    with pytest.raises(ValueError):
        codecs.decode(None, "wav")
    with pytest.raises(ValueError):
        codecs.decode(b"\x00" * 100, "flac")


def test_lossy_codecs_are_actually_lossy_but_bounded():
    pcm = synth_pcm(9, 22050, 500)
    wav_dec, _ = codecs.decode(codecs.encode(pcm, 22050, "wav"), "wav")
    mp3_dec, _ = codecs.decode(codecs.encode(pcm, 22050, "mp3"), "mp3")
    assert snr_db(pcm, mp3_dec) < snr_db(pcm, wav_dec)  # lossy < lossless
    assert 30.0 <= snr_db(pcm, mp3_dec) <= 80.0


def test_pcm_metrics_deterministic():
    pcm = synth_pcm(7, 16000, 1000)
    n, rms, peak = pcm_metrics(pcm)
    assert n == 16000
    assert 0.0 < rms < peak <= 0.8 + 1e-6
    assert pcm_metrics(synth_pcm(7, 16000, 1000)) == (n, rms, peak)
