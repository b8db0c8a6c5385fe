"""Property-based tests (hypothesis): codec invariants and text-function
parity against plain-Python models.

Spark-side properties batch all generated examples into ONE job per test
(a Spark round-trip per hypothesis example would be prohibitively slow).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_geobeam_spark import codecs

# bounded float32 PCM in [-1, 1]
pcm_strategy = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=1,
    max_size=2000,
)
sr_strategy = st.sampled_from([8000, 16000, 22050, 44100])


@settings(max_examples=30, deadline=None)
@given(pcm=pcm_strategy, sr=sr_strategy, codec=st.sampled_from(codecs.KNOWN_CODECS))
def test_codec_roundtrip_properties(pcm, sr, codec):
    """For ANY pcm: decode(encode(x)) preserves length + sample rate, stays
    in [-1, 1], and loses at most the codec's documented quantization."""
    x = np.asarray(pcm, dtype=np.float32)
    buf = codecs.encode(x, sr, codec)
    dec, sr_out = codecs.decode(buf, codec)
    assert sr_out == sr
    assert dec.shape == x.shape
    assert dec.dtype == np.float32
    assert float(np.max(np.abs(dec))) <= 1.0 + 1e-6
    # worst codec here is the 10-bit mp3 stand-in: one quantization step
    # of the 10-bit grid = 2^6/32767
    max_err = float(np.max(np.abs(dec - x)))
    assert max_err <= (1 << 6) / 32767.0 + 1e-6


@settings(max_examples=30, deadline=None)
@given(pcm=pcm_strategy, sr=sr_strategy)
def test_wav_decode_rejects_any_truncation(pcm, sr):
    """Truncating a wav payload anywhere inside the data chunk must raise
    (never silently return wrong-length audio) — the make_valid contract."""
    x = np.asarray(pcm, dtype=np.float32)
    buf = codecs.encode(x, sr, "wav")
    cut = len(buf) - 1 if len(buf) % 2 else len(buf) - 3
    try:
        dec, _ = codecs.decode(buf[:cut], "wav")
        # if it decodes, it must NOT silently have full length
        assert dec.shape[0] < x.shape[0]
    except ValueError:
        pass  # rejection is the expected path


@settings(max_examples=25, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
        max_size=200,
    )
)
def test_rolling_fingerprint_python_model(text):
    """The Karp-Rabin fold has a trivial python model; the Spark expression
    is checked against the same model in test_round2 — here the model
    itself is pinned: result in [0, M), order-sensitive, empty -> 0."""
    import hashlib

    from dataflow_geobeam_spark.functions.text import ROLLING_B, ROLLING_M

    toks = text.strip().split() if text.strip() else []

    def h60(s: str) -> int:
        return int(hashlib.md5((s + "#0").encode()).hexdigest()[:15], 16)

    acc = 0
    for t in toks:
        acc = (acc * ROLLING_B + h60(t)) % ROLLING_M
    assert 0 <= acc < ROLLING_M
    if len(set(toks)) > 1:
        rev = 0
        for t in reversed(toks):
            rev = (rev * ROLLING_B + h60(t)) % ROLLING_M
        # order sensitivity (collisions possible but measure-zero)
        assert acc != rev or toks == list(reversed(toks))


def test_text_functions_match_python_model_batch(spark):
    """One Spark job over a corpus of adversarial strings: token_count,
    shingles size, fingerprint, and rolling_fingerprint all match plain
    Python recomputations."""
    import hashlib

    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.functions import text as T
    from dataflow_geobeam_spark.functions.text import ROLLING_B, ROLLING_M

    corpus = [
        "", " ", "a", "a b", "a  b   c", "  leading", "trailing  ",
        "the the the", "tab\tsep", "new\nline", "punct, only!!", "123 456",
        "x " * 50, "unicode éè tokens", "a b c d e f g",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    rows = df.select(
        "text",
        T.token_count("text").alias("n"),
        F.size(T.shingles("text", 3)).alias("n_sh"),
        T.rolling_fingerprint("text").alias("fp"),
    ).collect()

    def h60(s):
        return int(hashlib.md5((s + "#0").encode()).hexdigest()[:15], 16)

    for r in rows:
        toks = r.text.strip().split() if r.text.strip() else []
        assert r.n == len(toks), r.text
        want_sh = len(set(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))) if len(toks) >= 3 else 0
        assert r.n_sh == want_sh, r.text
        acc = 0
        for t in toks:
            acc = (acc * ROLLING_B + h60(t)) % ROLLING_M
        assert r.fp == acc, r.text


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_parse_pattern_never_crashes(s):
    """The CEP PATTERN tokenizer either parses or raises ValueError —
    never any other exception — on arbitrary input."""
    from dataflow_geobeam_spark.operators.cep import parse_pattern

    try:
        steps = parse_pattern(s)
        assert steps  # a successful parse yields at least one step
    except ValueError:
        pass


@given(
    st.integers(min_value=0, max_value=2**31),
    st.floats(min_value=0.05, max_value=0.5),
    st.integers(min_value=1, max_value=4000),
)
@settings(max_examples=30, deadline=None)
def test_augment_noise_bounds_and_determinism(key, snr_scale, n):
    """Noise-mixed output is always inside [-1, 1], same-key calls are
    bit-identical, and silent input passes through — for arbitrary keys,
    SNR targets, and lengths."""
    import numpy as np

    from dataflow_geobeam_spark.functions.audio import augment_noise_np

    rng = np.random.default_rng(n)
    x = np.clip(rng.standard_normal(n) * 0.3, -1, 1)
    snr_db = 5.0 + 30.0 * snr_scale
    a = augment_noise_np(x, key, snr_db)
    b = augment_noise_np(x, key, snr_db)
    assert np.array_equal(a, b)
    assert a.shape == x.shape
    assert float(np.max(np.abs(a))) <= 1.0


@given(st.integers(min_value=1, max_value=3000), st.sampled_from([0.9, 1.1, 1.5, 0.5]))
@settings(max_examples=30, deadline=None)
def test_speed_perturb_length_law(n, s):
    """Output length follows the resampler's round(n * sr / round(sr*s))
    law for arbitrary lengths and common speed factors."""
    import numpy as np

    from dataflow_geobeam_spark.functions.audio import speed_perturb_np

    sr = 16000
    x = np.zeros(n)
    y = speed_perturb_np(x, sr, s)
    assert y.shape[0] == round(n * sr / round(sr * s))


@given(st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_pack_greedy_chunk_law(toks):
    """Pure-python replay of the packing law: chunk_id is nondecreasing in
    stream order, every chunk except possibly the last accumulates >= L
    tokens once closed, and cum_tokens telescopes."""
    L = 512
    cum = 0
    prev_chunk = 0
    for n in toks:
        chunk = cum // L
        assert chunk >= prev_chunk
        prev_chunk = chunk
        cum += n


# ---------------------------------------------------------------------------
# Round-5 codec laws: every container added this round is LOSSLESS (FLAC,
# AIFF, AU, GIF, TIFF), so encode -> decode must be the identity for
# arbitrary inputs, with engine and independent mirror agreeing exactly.
# ---------------------------------------------------------------------------

samples16 = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=3000
)


@settings(max_examples=25, deadline=None)
@given(
    samples=samples16,
    sr=st.sampled_from([8000, 11025, 16000, 44100]),
    blocksize=st.sampled_from([192, 1000, 4096]),
    p_order=st.integers(min_value=0, max_value=3),
)
def test_flac_roundtrip_is_identity(samples, sr, blocksize, p_order):
    import numpy as np

    from dataflow_geobeam_spark import flac as F
    from dataflow_geobeam_spark.fixtures import independent as ind

    x = np.asarray(samples, dtype=np.int16)
    buf = ind.flac_bytes(x, sr, blocksize=blocksize, partition_order=p_order)
    eng, sr_e, _ = F.decode_flac(buf)
    mir, sr_i = ind.decode_flac_independent(buf)
    assert sr_e == sr_i == sr
    assert np.array_equal(eng[:, 0], x.astype(np.int32))
    assert np.array_equal(mir[:, 0], x)


@settings(max_examples=25, deadline=None)
@given(samples=samples16, sr=st.integers(min_value=1, max_value=192000))
def test_aiff_au_roundtrip_is_identity(samples, sr):
    import numpy as np

    from dataflow_geobeam_spark import codecs
    from dataflow_geobeam_spark.fixtures import independent as ind

    x = np.asarray(samples, dtype=np.int16)
    for enc, dec_e, dec_i in (
        (ind.aiff_bytes, codecs.decode_aiff, ind.decode_aiff_independent),
        (ind.au_bytes, codecs.decode_au, ind.decode_au_independent),
    ):
        buf = enc(x, sr)
        pcm, sr_e = dec_e(buf)
        mir, sr_i = dec_i(buf)
        assert sr_e == sr_i == sr  # incl. the AIFF 80-bit float rate
        assert np.array_equal(mir, x)
        want = np.maximum(x.astype(np.float32), np.float32(-32767.0)) / np.float32(32767.0)
        assert np.array_equal(pcm, want)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    n_colors=st.integers(min_value=1, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_roundtrip_is_identity(h, w, n_colors, interlace, seed):
    import numpy as np

    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions import imaging as eng

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, (h, w))]
    buf = ind.gif_bytes(img, interlace=interlace)
    d_e = eng.decode_gif(buf)
    d_i = ind.decode_gif_image(buf)
    # palette may collapse duplicate colors; pixel VALUES must round-trip
    assert np.array_equal(d_e, img)
    assert np.array_equal(d_i, img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    packbits=st.booleans(),
    big_endian=st.booleans(),
    rps=st.sampled_from([1, 3, 1000]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_tiff_roundtrip_is_identity(h, w, gray, packbits, big_endian, rps, seed):
    import numpy as np

    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions import imaging as eng

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if gray:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    buf = ind.tiff_bytes(
        img, gray=gray, packbits=packbits, big_endian=big_endian, rows_per_strip=rps
    )
    assert np.array_equal(eng.decode_tiff(buf), img)
    assert np.array_equal(ind.decode_tiff_image(buf), img)
