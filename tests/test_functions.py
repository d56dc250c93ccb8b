"""Catalyst function modules: scrub chain, text quality, audio helpers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from heliport_spark.functions import text as T
from heliport_spark.functions.audio import (
    decode_compressed_audio,
    decode_pcm_s16le,
    encode_pcm_s16le,
    mel_features,
    sample_video_frames,
    snr_db,
)
from heliport_spark.functions.scrub import SCRUB_TOKEN, scrub_expr


def _one(spark, text, cols):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(*cols).collect()[0]


def test_scrub_patterns(spark):
    scrubbed, spans = scrub_expr("t")
    r = _one(
        spark,
        "mail a@b.com, call +1 (555) 123-4567, ssn 123-45-6789, "
        "see https://x.io/p?q=1, ping @someone, you badword",
        [scrubbed.alias("s"), spans.alias("n")],
    )
    assert "a@b.com" not in r["s"]
    assert "555" not in r["s"]
    assert "123-45-6789" not in r["s"]
    assert "https://" not in r["s"]
    assert "@someone" not in r["s"]
    assert "badword" not in r["s"]
    assert r["s"].count(SCRUB_TOKEN) == r["n"] == 6


def test_scrub_clean_text_untouched(spark):
    scrubbed, spans = scrub_expr("t")
    r = _one(spark, "a plain sentence with no pii at all",
             [scrubbed.alias("s"), spans.alias("n")])
    assert r["s"] == "a plain sentence with no pii at all"
    assert r["n"] == 0


def test_scrub_apply_equals_scrub_expr(spark):
    """scrub_apply (gate-once hot path) must produce byte-identical output
    to the inline scrub_expr twins on dirty, clean, empty, and NULL rows —
    it is an evaluation-strategy change, never a semantics change."""
    from heliport_spark.functions.scrub import scrub_apply

    rows = [
        ("mail a@b.com and ssn 123-45-6789 you badword",),
        ("a perfectly clean sentence",),
        ("",),
        (None,),
        ("digits 123 but no pii shapes here 2024",),  # gate false-positive
    ]
    df = spark.createDataFrame(rows, schema="t string")
    s, n = scrub_expr("t")
    a = df.select(s.alias("s"), n.alias("n")).collect()
    b = scrub_apply(df, "t", text_out="s", spans_out="n").select("s", "n").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_scrub_null_propagates(spark):
    """NULL text → NULL scrubbed text AND NULL span count, matching the
    DuckDB oracle's regexp chain (ADVICE r02: the early-exit otherwise(0)
    used to turn NULL into 0, diverging for non-aggregate consumers)."""
    from pyspark.sql.types import StringType

    scrubbed, spans = scrub_expr("t")
    df = spark.createDataFrame([(None,)], schema="t string")
    r = df.select(scrubbed.alias("s"), spans.alias("n")).collect()[0]
    assert r["s"] is None
    assert r["n"] is None


def test_events_sessions_timezone_independent(spark):
    """events_sessions must neither mutate the session timezone nor depend
    on it (ADVICE r02: it used to set spark.sql.session.timeZone=UTC as a
    side effect): identical results under UTC and America/New_York."""
    import __spark_entry__ as e

    q = e.extra_queries()["events_sessions"]  # extra since r6 (cap policy)
    sf = "/root/testdata/sf0.01"
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = sorted(map(tuple, q(spark, sf).collect()))
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(map(tuple, q(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert nyc == utc


def test_text_ratios(spark):
    c = F.col("t")
    r = _one(
        spark,
        "The cat sat on the mat 42 times!",
        [
            T.n_tokens(c).alias("nt"),
            T.n_chars(c).alias("nc"),
            T.digit_ratio(c).alias("dr"),
            T.stopword_ratio(c).alias("sr"),
            T.fingerprint(c).alias("fp"),
        ],
    )
    assert r["nt"] == 8
    assert r["nc"] == 32
    assert 0.0 < r["dr"] < 0.1
    assert r["sr"] == pytest.approx(3 / 8)  # 'The', 'on', 'the'
    assert len(r["fp"]) == 32


def test_token_counts_tab_newline_safe(spark):
    """trim() strips only ASCII spaces, so 'hello world\\n' used to count a
    phantom third token — n_tokens/mean_word_len/gopher words must treat
    ALL whitespace as boundaries (ws_strip)."""
    from heliport_spark.operators.corpus import gopher_metrics
    from heliport_spark.operators.train import words_expr

    rows = [("hello world\n",), ("\thello\n",), ("\t\n",), ("",), (" a  b ",)]
    df = spark.createDataFrame(rows, "t string")
    c = F.col("t")
    m = gopher_metrics(c)
    got = df.select(
        T.n_tokens(c).alias("nt"),
        F.round(T.mean_word_len(c), 4).alias("mwl"),
        m["n_words"].alias("gw"),
        F.size(words_expr(c)).alias("we"),
    ).collect()
    assert [(r["nt"], r["gw"], r["we"]) for r in got] == [
        (2, 2, 2), (1, 1, 1), (0, 0, 0), (0, 0, 0), (2, 2, 2)
    ]
    assert got[0]["mwl"] == 5.0  # 10 chars / 2 words, not 10/3


def test_stopword_on(spark):
    c = F.col("t")
    r = _one(spark, "the on a", [T.stopword_ratio(c).alias("sr")])
    assert r["sr"] == pytest.approx(1.0)


def test_repetition_flag(spark):
    c = F.col("t")
    r = _one(spark, "go go go go go now", [T.repetition_ratio(c).alias("rr")])
    assert r["rr"] == 1
    r2 = _one(spark, "well well, fine", [T.repetition_ratio(c).alias("rr")])
    assert r2["rr"] == 0


def test_pcm_roundtrip():
    rng = np.random.default_rng(3)
    w = (rng.uniform(-1, 1, 4000) * 0.8).astype(np.float32)
    raw = encode_pcm_s16le(w)
    w2 = decode_pcm_s16le(raw)
    assert snr_db(w, w2) > 30.0
    assert encode_pcm_s16le(w2) == raw  # fixpoint after first quantization


def test_audio_signal_flags(spark):
    """Silence / clipping / drift fixtures each trip exactly their flag;
    a normal tone stays clean (keep_signal)."""
    from heliport_spark.functions.audio import (
        audio_features_df,
        audio_signal_flags,
        encode_pcm_s16le,
    )

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 s
    tone = encode_pcm_s16le((0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    silence = encode_pcm_s16le(np.zeros(sr, dtype=np.float32))
    square = encode_pcm_s16le(
        np.where(np.sin(2 * np.pi * 440 * t) >= 0, 1.0, -1.0).astype(np.float32)
    )
    # metadata says 2 s but audio is 1 s
    rows = [
        ("clean", tone, sr, 1000),
        ("silent", silence, sr, 1000),
        ("clipped", square, sr, 1000),
        ("drift", tone, sr, 2000),
        ("empty", b"", sr, 1000),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int, dur_ms int")
    out = {
        r["clip_id"]: r
        for r in audio_signal_flags(audio_features_df(df)).collect()
    }
    assert out["clean"]["keep_signal"] and out["clean"]["signal_flags"] == ""
    assert "digital_silence" in out["silent"]["signal_flags"]
    assert "mostly_silent" in out["silent"]["signal_flags"]
    assert out["silent"]["silence_ratio"] == 1.0
    assert out["clipped"]["signal_flags"] == "clipped"
    assert out["clipped"]["clip_ratio"] > 0.9
    assert out["drift"]["signal_flags"] == "metadata_drift"
    assert "no_audio" in out["empty"]["signal_flags"]
    assert all(not out[k]["keep_signal"] for k in ("silent", "clipped", "drift", "empty"))


def test_audio_features_wav_codec_rows(spark):
    """VERDICT r03 #8: a codec='wav' row flows through audio_features / the
    signal gate — full RIFF parse, stats identical to the equivalent raw-PCM
    row, stereo mean-downmixed, container sample rate authoritative for
    silence framing, malformed container dropped by the gate (not a crash)."""
    from heliport_spark.functions.audio import (
        audio_features_df,
        audio_signal_flags,
        encode_pcm_s16le,
        encode_wav,
    )

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    mono = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    stereo = np.empty(2 * sr, dtype=np.float32)
    stereo[0::2] = mono  # L
    stereo[1::2] = mono  # R → downmix == mono
    rows = [
        ("pcm", encode_pcm_s16le(mono), sr, 1000, "pcm_s16le"),
        ("wav", encode_wav(mono, sr), sr, 1000, "wav"),
        ("wav_st", encode_wav(stereo, sr, channels=2), sr, 1000, "wav"),
        ("wav_bad", b"RIFFgarbage-not-a-wave-file", sr, 1000, "wav"),
        # chunk header declares a 16-byte fmt body but the file ends —
        # struct.error (NOT a ValueError) must also be contained
        ("wav_trunc",
         b"RIFF" + (20).to_bytes(4, "little") + b"WAVE"
         + b"fmt " + (16).to_bytes(4, "little") + b"\x01\x00",
         sr, 1000, "wav"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )
    out = {
        r["clip_id"]: r
        for r in audio_signal_flags(audio_features_df(df)).collect()
    }
    # WAV row == PCM row stat-for-stat (same waveform, container stripped)
    for col in ("n_samples", "rms", "peak", "clip_ratio", "silence_ratio"):
        assert out["wav"][col] == out["pcm"][col], col
    assert out["wav"]["keep_signal"] and out["wav"]["signal_flags"] == ""
    # stereo mean-downmix: same per-frame content ⇒ same stats, 1 s of audio
    assert out["wav_st"]["n_samples"] == sr
    assert abs(out["wav_st"]["rms"] - out["pcm"]["rms"]) < 1e-4
    assert out["wav_st"]["keep_signal"]
    # malformed container: zero-sample stats ⇒ gate drops the ROW, job lives
    for bad in ("wav_bad", "wav_trunc"):
        assert out[bad]["n_samples"] == 0
        assert not out[bad]["keep_signal"]
        assert "no_audio" in out[bad]["signal_flags"]


def test_resample_audio_df(spark):
    """Sample-rate unification: 8 kHz clip doubles its sample count at
    16 kHz with the tone preserved (dominant FFT bin); already-at-target
    clips pass through BYTE-IDENTICAL; un-resamplable rows emit NULL
    bytes_rs (ADVICE r04 — bytes_rs is uniformly PCM-or-NULL, container
    bytes must never masquerade as samples); source bytes column never
    modified."""
    from heliport_spark.functions.audio import (
        decode_pcm_s16le,
        encode_pcm_s16le,
        resample_audio_df,
    )

    def tone(sr, hz=440.0):
        t = np.arange(sr, dtype=np.float64) / sr  # 1 second
        return encode_pcm_s16le((0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32))

    from heliport_spark.functions.audio import encode_wav

    wav8 = encode_wav(
        (0.3 * np.sin(2 * np.pi * 440.0 * np.arange(8000) / 8000)).astype(np.float32),
        8000,
    )
    rows = [
        ("low", tone(8000), 8000, 1000, "pcm_s16le"),
        ("at_target", tone(16000), 16000, 1000, "pcm_s16le"),
        ("nosr", tone(16000), None, 1000, "pcm_s16le"),
        # WAV container: its OWN 8 kHz rate is used (metadata says 16k!),
        # and the output is RAW PCM at target (container stripped)
        ("wav8", wav8, 16000, 1000, "wav"),
        ("wav_bad", b"RIFFgarbage-not-a-wave", 16000, 1000, "wav"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )
    out = {r["clip_id"]: r for r in resample_audio_df(df, 16000).collect()}
    low = out["low"]
    assert low["n_samples_rs"] == 16000 and low["sr_rs"] == 16000
    w = decode_pcm_s16le(low["bytes_rs"])
    dom = np.argmax(np.abs(np.fft.rfft(w.astype(np.float64))))
    assert abs(dom - 440) <= 2  # 1 s of audio → bin index ≈ Hz
    assert low["bytes"] == rows[0][1]  # source untouched
    assert out["at_target"]["bytes_rs"] == rows[1][1]  # byte-identical
    # unknown rate: NULL output column (original survives in `bytes`),
    # and sr_rs must NOT claim the target rate
    assert out["nosr"]["bytes_rs"] is None
    assert out["nosr"]["sr_rs"] is None
    assert out["nosr"]["bytes"] == rows[2][1]
    # WAV: container's 8 kHz wins over the drifted 16 kHz metadata → real
    # resample work, raw-PCM output at target
    wv = out["wav8"]
    assert wv["sr_rs"] == 16000 and wv["n_samples_rs"] == 16000
    domw = np.argmax(
        np.abs(np.fft.rfft(decode_pcm_s16le(wv["bytes_rs"]).astype(np.float64)))
    )
    assert abs(domw - 440) <= 2
    # malformed container: NULL bytes_rs/sr_rs, original kept, job alive
    assert out["wav_bad"]["bytes_rs"] is None
    assert out["wav_bad"]["sr_rs"] is None
    assert out["wav_bad"]["bytes"] == rows[4][1]


def test_audio_embedding_neardup_composition(spark):
    """The acoustic embedding (time-mean log-mel) composed with the
    embedding near-dup machinery finds AUDIO near-duplicates: noisy copies
    of the same tone pair up (cosine ≈ 0.9998 measured), different spectral
    content does not (cross ≈ 0.54); NULL audio → NULL embedding, no crash."""
    from pyspark.sql import functions as F

    from heliport_spark.functions.audio import audio_embedding_df, encode_pcm_s16le
    from heliport_spark.operators.similarity import embedding_neardup

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    rng = np.random.default_rng(0)

    def noisy(hz):
        w = 0.3 * np.sin(2 * np.pi * hz * t) + 0.05 * rng.standard_normal(sr)
        return encode_pcm_s16le(w.astype(np.float32))

    rows = [
        ("a1", noisy(440), sr), ("a2", noisy(440), sr), ("a3", noisy(440), sr),
        ("b1", noisy(2000), sr), ("b2", noisy(2000), sr),
        ("empty", b"", sr),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int")
    emb = audio_embedding_df(df).select("clip_id", "aemb")
    assert emb.filter(F.col("clip_id") == "empty").first()["aemb"] is None
    pairs = {
        frozenset((r["id_a"], r["id_b"]))
        for r in embedding_neardup(
            emb, threshold=0.99, id_col="clip_id", vec_col="aemb",
            dim=16, n_planes=4,
        ).collect()
    }
    want = {
        frozenset(p)
        for p in [("a1", "a2"), ("a1", "a3"), ("a2", "a3"), ("b1", "b2")]
    }
    assert pairs == want


def test_audio_ops_survive_null_sr(spark):
    """A NULL sr_hz row (NaN in pandas — truthy!) must not crash the Arrow
    batch: features fall back to 16 kHz framing, chunking skips the row."""
    from heliport_spark.functions.audio import (
        audio_features_df,
        audio_signal_flags,
        chunk_audio_df,
        encode_pcm_s16le,
    )

    tone = encode_pcm_s16le(
        (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    )
    df = spark.createDataFrame(
        [("nosr", tone, None, 1000), ("ok", tone, 16000, 1000)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int",
    )
    feats = {r["clip_id"]: r for r in audio_features_df(df).collect()}
    assert feats["nosr"]["n_samples"] == 16000
    assert feats["nosr"]["silence_ratio"] == 0.0
    # signal flags also run (drift check divides by sr — NULL sr gives NULL
    # drift, no crash; row keeps its other flags)
    audio_signal_flags(audio_features_df(df)).collect()
    chunks = chunk_audio_df(df, window_ms=500).collect()
    assert {r["clip_id"] for r in chunks} == {"ok"}


def test_normalize_loudness(spark):
    """Quiet tone is brought to target RMS, loud audio is attenuated (never
    clipped harder), silence stays silent (gain capped), and the original
    bytes column is untouched."""
    from heliport_spark.functions.audio import (
        MAX_GAIN,
        TARGET_RMS,
        decode_pcm_s16le,
        encode_pcm_s16le,
        normalize_loudness_df,
    )

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    quiet = encode_pcm_s16le((0.01 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    loud = encode_pcm_s16le((0.9 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    silence = encode_pcm_s16le(np.zeros(sr, dtype=np.float32))
    df = spark.createDataFrame(
        [("quiet", quiet, sr), ("loud", loud, sr), ("silent", silence, sr)],
        "clip_id string, bytes binary, sr_hz int",
    )
    out = {r["clip_id"]: r for r in normalize_loudness_df(df).collect()}

    def rms(raw):
        w = decode_pcm_s16le(raw)
        return float(np.sqrt(np.mean(w.astype(np.float64) ** 2)))

    assert abs(rms(out["quiet"]["bytes_norm"]) - TARGET_RMS) < 0.002
    assert abs(rms(out["loud"]["bytes_norm"]) - TARGET_RMS) < 0.002
    assert out["loud"]["gain_db"] < 0 < out["quiet"]["gain_db"]
    assert rms(out["silent"]["bytes_norm"]) == 0.0
    assert bytes(out["quiet"]["bytes"]) == quiet  # original untouched
    # gain cap: a clip 1000x below target gets MAX_GAIN, not target/rms
    tiny = encode_pcm_s16le((1e-4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    df2 = spark.createDataFrame([("tiny", tiny, sr)],
                                "clip_id string, bytes binary, sr_hz int")
    r2 = normalize_loudness_df(df2).collect()[0]
    assert r2["gain_db"] <= 20.0 * np.log10(MAX_GAIN) + 1e-3


def test_chunk_audio(spark):
    """Chunks reconcatenate to the exact original bytes, windows are
    window_ms long (except the last), and a sub-min_tail sliver is merged
    into the previous chunk instead of emitted."""
    from heliport_spark.functions.audio import chunk_audio_df, encode_pcm_s16le

    sr = 16000
    # 2.5 s clip, 1 s windows -> chunks of 1 s, 1 s, 0.5 s (tail >= min_tail)
    w = (0.3 * np.sin(2 * np.pi * 440 * np.arange(int(2.5 * sr)) / sr)).astype(
        np.float32
    )
    raw = encode_pcm_s16le(w)
    # 2.05 s clip -> 50 ms tail < min_tail 100 ms: merged, chunks 1 s + 1.05 s
    raw2 = encode_pcm_s16le(w[: int(2.05 * sr)])
    df = spark.createDataFrame(
        [("a", raw, sr), ("b", raw2, sr)], "clip_id string, bytes binary, sr_hz int"
    )
    out = chunk_audio_df(df, window_ms=1000, min_tail_ms=100).collect()
    a = sorted((r for r in out if r["clip_id"] == "a"), key=lambda r: r["chunk_idx"])
    b = sorted((r for r in out if r["clip_id"] == "b"), key=lambda r: r["chunk_idx"])
    assert [r["dur_ms"] for r in a] == [1000, 1000, 500]
    assert [r["start_ms"] for r in a] == [0, 1000, 2000]
    assert b"".join(bytes(r["bytes"]) for r in a) == raw
    assert [r["dur_ms"] for r in b] == [1000, 1050]
    assert b"".join(bytes(r["bytes"]) for r in b) == raw2
    assert a[0]["chunk_id"] == "a#0000"


def test_multimodal_stubs():
    with pytest.raises(NotImplementedError):
        decode_compressed_audio(b"\x00", "opus")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00")


def test_mel_features_real():
    """mel_features is a REAL log-mel (numpy STFT + Slaney filterbank, no
    DSP libs): silence → zeros; a pure tone's energy lands in the mel bin
    whose filter peaks at the tone frequency."""
    from heliport_spark.functions.audio import mel_filterbank

    m = mel_features(np.zeros(1600, dtype=np.float32), 16000)
    assert m.shape == (8, 80) and m.dtype == np.float32  # 400/160 framing
    np.testing.assert_array_equal(m, 0.0)  # log1p(0) — true silence

    sr, f0 = 16000, 1000.0
    t = np.arange(sr, dtype=np.float64) / sr
    tone = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    mt = mel_features(tone, sr)
    fb = mel_filterbank(sr, 400, 80)
    tone_bin = int(round(f0 * 400 / sr))
    expect = int(np.argmax(fb[:, tone_bin]))
    got = int(np.argmax(mt.mean(axis=0)))
    assert abs(got - expect) <= 1
    # energy is concentrated: the winning bin dominates the far field
    assert mt.mean(axis=0)[got] > 10 * mt.mean(axis=0)[min(got + 20, 79)]


def test_wav_roundtrip_and_resample():
    from heliport_spark.functions.audio import (
        decode_wav,
        encode_wav,
        resample_linear,
    )

    rng = np.random.default_rng(3)
    w = (rng.uniform(-1, 1, 3200) * 0.7).astype(np.float32)
    raw = encode_wav(w, 16000)
    w2, sr, ch = decode_wav(raw)
    assert (sr, ch) == (16000, 1)
    assert snr_db(w, w2) > 30.0
    with pytest.raises(ValueError):
        decode_wav(b"not a wav")
    # linear resample: length scales, and a slow ramp survives ~losslessly
    ramp = np.linspace(-0.5, 0.5, 8000).astype(np.float32)
    up = resample_linear(ramp, 8000, 16000)
    assert abs(len(up) - 16000) <= 1
    assert snr_db(np.linspace(-0.5, 0.5, len(up)).astype(np.float32), up) > 40.0


def test_lsh_bucket_udf_matches_expr(spark):
    """The Arrow-batched bucket UDF (used when n_planes×dim would bloat the
    Catalyst plan) must produce bit-identical keys to the unrolled expr."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket_expr,
        lsh_bucket_sql,
        lsh_bucket_udf,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    planes = hyperplanes(64, 10)
    both = e.select(
        lsh_bucket_expr(F.col("embedding"), planes).alias("k_expr"),
        lsh_bucket_udf(planes)(F.col("embedding")).alias("k_udf"),
        lsh_bucket_sql("embedding", planes).alias("k_sql"),
    )
    assert both.filter(F.col("k_expr") != F.col("k_udf")).count() == 0
    # the single-parse SQL builder (the hot query-construction path) must be
    # BIT-identical to the Column form — same operators, repr round-trip
    # literals
    assert both.filter(F.col("k_expr") != F.col("k_sql")).count() == 0


def test_identify_df_relevant_langs(spark):
    """DataFrame-level T8 (relevant_langs, the twin of CLI -l): restricted
    to {spa, eng}, a Polish sentence can no longer win as pol, while the
    Spanish golden stays spa."""
    from heliport_spark.operators.identify import identify_df

    df = spark.createDataFrame(
        [("Hola, ¿qué tal?",), ("DOKUMENT INFORMACYJNY NR",)],
        schema="transcript string",
    )
    full = {r["transcript"]: r["lang"] for r in identify_df(df).collect()}
    assert full["DOKUMENT INFORMACYJNY NR"] == "pol"
    sub = {
        r["transcript"]: r["lang"]
        for r in identify_df(
            df, ignore_confidence=True, langs=["spa", "eng"]
        ).collect()
    }
    assert sub["Hola, ¿qué tal?"] == "spa"
    assert sub["DOKUMENT INFORMACYJNY NR"] in ("spa", "eng")


def test_corpus_sketches_accuracy_vs_exact(spark):
    """Sketch aggregates (HLL + quantile summary) must land within their
    documented error bounds of the exact operators: approx_count_distinct
    default rsd is 5%, approx_percentile at accuracy 2000 is near-exact at
    this scale."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.corpus import corpus_sketches, length_stats

    import numpy as np

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    approx = {r["source"]: r for r in corpus_sketches(d).collect()}
    lens: dict = {}
    for r in d.select("source", F.length("text").alias("l")).collect():
        lens.setdefault(r["source"], []).append(r["l"])
    assert set(approx) == set(lens)
    for src, row in approx.items():
        n = len(lens[src])
        assert abs(row["approx_docs"] - n) <= max(2, 0.15 * n)
        # the sketch median must be an actual order statistic near the true
        # median (interpolation-free bound: within the exact p35..p65 band —
        # groups are only ~25 docs at sf0.01, so element gaps are wide)
        lo, hi = np.percentile(lens[src], [35, 65])
        assert lo <= row["p50_len_approx"] <= hi, (src, row["p50_len_approx"], lo, hi)


def test_quota_sample_partitioning_invariant(spark):
    """quota_sample must pick the SAME rows regardless of physical layout
    (its whole point: reproducible data mixing with no RNG)."""
    from heliport_spark.operators.corpus import quota_sample

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(map(tuple, quota_sample(d, k=5).collect()))
    b = sorted(map(tuple, quota_sample(d.repartition(13), k=5).collect()))
    assert a == b and len(a) > 0


def test_c4_rules_hand_counts(spark):
    """C4 page-filter semantics on a hand-built fixture: line keeping
    (terminal punctuation AND ≥5 words), the three page flags, and the
    ≥3-kept-lines keep decision — each boundary exercised both ways."""
    from heliport_spark.operators.corpus import c4_rules

    good = "\n".join(
        [
            "this line has exactly six words.",   # kept
            'five words then a quote"',           # kept (quote terminal)
            "short line.",                        # dropped: < 5 words
            "no terminal punctuation on this one",  # dropped: no punct
            "another sentence with enough words here!",  # kept
        ]
    )
    rows = [
        (1, good),                                    # 3 kept -> keep
        (2, good + "\nby the way badword appears."),  # badword -> drop
        (3, good + "\nLorem Ipsum filler text."),     # lorem (ci) -> drop
        (4, good + "\ncode { block"),                 # brace -> drop
        (5, "one good sentence with five words.\nsecond good sentence "
            "right here too.")                        # 2 kept < 3 -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["id"]: r for r in c4_rules(df).collect()}
    assert got[1]["n_lines"] == 5 and got[1]["n_kept_lines"] == 3
    assert got[1]["keep"] is True
    assert got[2]["has_badword"] and not got[2]["keep"]
    assert got[3]["has_lorem"] and not got[3]["keep"]
    assert got[4]["has_brace"] and not got[4]["keep"]
    assert got[5]["n_kept_lines"] == 2 and not got[5]["keep"]


def test_text_ops_survive_null_and_empty_text(spark):
    """NULL and empty text rows must not crash (or poison) the dedup /
    corpus operators: they contribute no shingles/words and drop out of
    signature outputs rather than erroring."""
    from heliport_spark.operators.corpus import gopher_quality
    from heliport_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        simhash,
    )

    df = spark.createDataFrame(
        [(1, None, "s"), (2, "", "s"), (3, "   ", "s"),
         (4, "real words here", "s"), (5, "real words here", "s")],
        "doc_id bigint, text string, source string",
    )
    sigs = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    assert 4 in sigs and 5 in sigs and sigs[4] == sigs[5]
    assert 1 not in sigs and 2 not in sigs  # no words -> no signature row
    cands = minhash_lsh_candidates(df).collect()
    assert {(r["id_a"], r["id_b"]) for r in cands} >= {(4, 5)}
    exact_dedup(df).collect()          # must not raise
    gopher_quality(df).collect()       # must not raise


def test_minhash_estimate_brackets_exact_jaccard(spark):
    """Broder estimator sanity: identical docs estimate 1.0; on the real
    corpus every estimate is within 2/H·1.5 of the exact Jaccard for pairs
    both paths emit (H=12 → granularity 1/12)."""
    from heliport_spark.operators.dedup import (
        minhash_jaccard_estimate,
        ngram_jaccard_pairs,
        minhash_lsh_candidates,
    )

    dup = spark.createDataFrame(
        [(1, "the same exact text body"), (2, "the same exact text body")],
        "doc_id bigint, text string",
    )
    est = minhash_jaccard_estimate(dup).collect()
    assert [(r["id_a"], r["id_b"], r["est_jaccard"]) for r in est] == [(1, 2, 1.0)]

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    cands = minhash_lsh_candidates(d)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(d, candidates=cands, threshold=0.0).collect()}
    errs = []
    for r in minhash_jaccard_estimate(d, threshold=0.5).collect():
        key = (r["id_a"], r["id_b"])
        assert key in exact
        errs.append(abs(r["est_jaccard"] - exact[key]))
    # H=12 ⇒ per-pair σ = √(J(1−J)/12) ≈ 0.13: individual pairs can land
    # 3-4σ out (that's the estimator's documented coarseness), but the MEAN
    # error over the candidate set must look like one σ, not like bias
    assert errs and sum(errs) / len(errs) <= 0.17


def test_dup_clusters_components(spark):
    """Chains and cycles collapse to min-id components; exactly one
    canonical per cluster; partitioning-invariant."""
    from heliport_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),          # 5-chain (diameter test)
         (10, 11),                                 # simple pair
         (20, 21), (21, 22), (22, 20)],            # triangle
        "id_a bigint, id_b bigint",
    )
    got = {r["id"]: (r["cluster_id"], r["is_canonical"])
           for r in dup_clusters(pairs).collect()}
    assert {i: got[i][0] for i in got} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20
    }
    assert sorted(i for i, (_, c) in got.items() if c) == [1, 10, 20]
    b = {r["id"]: r["cluster_id"]
         for r in dup_clusters(pairs.repartition(7)).collect()}
    assert b == {i: got[i][0] for i in got}
    # deep component: a 200-node path engages pointer jumping after the
    # 3 plain rounds and must still fully collapse (O(log diameter) <<
    # max_iters; plain propagation alone would need 199 rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a bigint, id_b bigint"
    )
    deep = {r["id"]: r["cluster_id"] for r in dup_clusters(chain).collect()}
    assert len(deep) == 200 and all(v == 0 for v in deep.values())


def test_dup_clusters_star_equals_label(spark):
    """algorithm="star" (large-star/small-star, the edge-contracting
    O(log² n) mode) must return EXACTLY the default label-propagation
    mode's output: on chains/cycles/pairs, on a 200-node path (deep
    component — star must converge in far fewer than 199 rounds), and on
    the real sf0.01 simhash pair graph. Bad algorithms fail loudly:
    max_iters exhaustion raises in both modes."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.dedup import dup_clusters, simhash_pairs

    def as_map(df):
        return {r["id"]: (r["cluster_id"], r["is_canonical"])
                for r in df.collect()}

    shapes = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11),
         (20, 21), (21, 22), (22, 20),
         (30, 33), (31, 33), (32, 33)],          # star already (big hub)
        "id_a bigint, id_b bigint",
    )
    assert as_map(dup_clusters(shapes, algorithm="star")) == as_map(
        dup_clusters(shapes)
    )
    # deep path: the star alternation contracts geometrically — cap the
    # round budget far below the 199 plain label rounds the path needs
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a bigint, id_b bigint"
    )
    star_deep = as_map(dup_clusters(chain, algorithm="star", max_iters=12))
    assert star_deep == as_map(dup_clusters(chain))
    # real near-dup graph (string ids exercise non-numeric ordering)
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    p = simhash_pairs(d).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
    )
    assert as_map(dup_clusters(p, algorithm="star")) == as_map(
        dup_clusters(p)
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, algorithm="star", max_iters=1)


def test_dup_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches the per-round lineage cut from
    localCheckpoint (non-reliable executor-local blocks) to df.checkpoint()
    on shared storage — VERDICT r03 #3: an executor lost mid-loop on a real
    cluster must be able to re-read checkpointed blocks instead of failing
    the multi-hour dedup job. Same labels as the default path, and the
    checkpoint directory must actually receive data (proof the reliable
    mechanism engaged, not a silent localCheckpoint fallback)."""
    import os

    from heliport_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (22, 20)]
        + [(100 + i, 101 + i) for i in range(10)],  # >3 rounds: cuts repeat
        "id_a bigint, id_b bigint",
    )
    ckpt = str(tmp_path / "cc_ckpt")
    base = {r["id"]: (r["cluster_id"], r["is_canonical"])
            for r in dup_clusters(pairs).collect()}
    # a caller's pre-existing checkpoint dir must be RESTORED afterwards
    # (setCheckpointDir is global SparkContext state — code-review r4)
    caller_dir = str(tmp_path / "caller_ckpt")
    spark.sparkContext.setCheckpointDir(caller_dir)
    rel = {r["id"]: (r["cluster_id"], r["is_canonical"])
           for r in dup_clusters(pairs, checkpoint_dir=ckpt).collect()}
    assert rel == base
    restored = spark.sparkContext._jsc.sc().getCheckpointDir()
    # the effective dir is root/<fresh UUID>: its PARENT must be exactly the
    # caller's root — not nested inside the previous run's UUID dir
    # (setCheckpointDir appends a UUID component per call)
    assert restored.isDefined()
    assert restored.get().rsplit("/", 1)[0].endswith(caller_dir)
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable checkpoint dir received no files"


def test_dup_clusters_bad_algorithm_no_ckpt_mutation(spark, tmp_path):
    """ADVICE r6 #1: an invalid algorithm name must raise BEFORE the
    checkpoint-dir mutation — dup_clusters(..., algorithm='typo') used to
    permanently redirect the app's global checkpoint dir (the validation
    sat between setCheckpointDir and the try/finally that restores it)."""
    import pytest as _pytest

    from heliport_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    caller_dir = str(tmp_path / "caller_ckpt")
    spark.sparkContext.setCheckpointDir(caller_dir)
    before = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    with _pytest.raises(ValueError, match="unknown algorithm"):
        dup_clusters(pairs, checkpoint_dir=str(tmp_path / "bad"),
                     algorithm="typo")
    after = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert after == before  # untouched, not even a fresh UUID under caller


def test_ngram_repetition_per_doc(spark):
    """Within-doc duplicated n-gram fraction: known hand counts, gram-less
    docs (short/empty) emit 0.0 rows, partitioning-invariant."""
    from heliport_spark.operators.corpus import ngram_repetition

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab → 5/5 duplicated
            (2, "a b c d e"),     # 4 distinct bigrams → 0.0
            (3, "x y z x y"),     # xy,yz,zx,xy → dup 2/4 = 0.5
            (4, "single"),        # no bigrams
            (5, ""),              # empty
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["dup_ngram_frac"], r["n_grams"])
        for r in ngram_repetition(docs, n=2).collect()
    }
    assert got == {
        1: (1.0, 5),
        2: (0.0, 4),
        3: (0.5, 4),
        4: (0.0, 0),
        5: (0.0, 0),
    }
    b = {
        r["doc_id"]: (r["dup_ngram_frac"], r["n_grams"])
        for r in ngram_repetition(docs.repartition(7), n=2).collect()
    }
    assert b == got


def test_curate_corpus_composition(spark):
    """The end-to-end curation query genuinely exercises every stage on the
    sf0.01 fixture (each prunes: 500 → 325 source gate → 319 near-dup →
    288 corpus-split → 258 decon → 245 gopher → 195 resample) and its pick
    differs from naively resampling the raw corpus; the final CCNet
    bucketing labels every language's survivors ~equally across
    head/middle/tail."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    rows = E._curate_corpus(spark, sf).collect()
    curated = {(r.lang, r.doc_id) for r in rows}
    raw = {
        tuple(r)
        for r in E.queries()["temperature_resample"](spark, sf).collect()
    }
    assert len(curated) > 100  # quota genuinely filled from survivors
    assert curated != raw  # upstream stages changed the selection
    # every row is bucketed; per language, bucket populations differ <= 1
    # (ntile equal-population guarantee)
    assert all(r.bucket_label in ("head", "middle", "tail") for r in rows)
    from collections import Counter

    per_lang = Counter((r.lang, r.bucket) for r in rows)
    langs = {r.lang for r in rows}
    for lg in langs:
        sizes = [per_lang.get((lg, b), 0) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1


def test_source_reputation_filter(spark):
    """Domain gate: a junk-heavy source loses ALL its docs (even its one
    good page); a reputable source keeps only its passing docs — unless
    require_doc_keep=False, which admits everything from good sources."""
    from heliport_spark.operators.corpus import source_reputation_filter

    good_text = "the quick brown fox jumps over the lazy dog again and again"
    junk_text = "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"
    rows = [(i, "spamfarm", junk_text) for i in range(9)]
    rows += [(9, "spamfarm", good_text)]               # 1/10 keep rate
    rows += [(100 + i, "news", good_text) for i in range(9)]
    rows += [(109, "news", junk_text)]                 # 9/10 keep rate
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = source_reputation_filter(df).collect()
    ids = {r["doc_id"] for r in kept}
    assert ids == {100 + i for i in range(9)}  # spamfarm fully gone,
    # news keeps only its passing docs; with the doc-level rule off, the
    # whole reputable domain survives (109 included), spamfarm still gone
    all_news = source_reputation_filter(df, require_doc_keep=False).collect()
    assert {r["doc_id"] for r in all_news} == {100 + i for i in range(10)}


def test_quality_buckets_cutoff_matches_ntile(spark):
    """quality_buckets: the cutoff scale path (sketch cutoffs + broadcast,
    no per-group sort) agrees with the exact ntile twin on tie-free data
    (the sketch is exact below `accuracy` rows); buckets are contiguous
    score ranges per group; ascending flag flips which end is head; the
    cutoff plan contains NO Window/Sort over the data side."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.corpus import quality_buckets

    # tie-free scores: two groups, 30 + 31 rows, irrational-ish spacing
    rows = [(i, "g1", (i * 37 % 101) + i / 1000.0) for i in range(30)]
    rows += [(100 + i, "g2", (i * 53 % 97) + i / 1000.0) for i in range(31)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    exact = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "score", mode="ntile").collect()
    }
    cut = quality_buckets(df, "score", mode="cutoff").cache()
    try:
        got = {r["doc_id"]: r["bucket"] for r in cut.collect()}
        agree = sum(exact[k] == got[k] for k in exact) / len(exact)
        assert agree >= 0.95, f"cutoff vs ntile agreement {agree:.2f}"
        # buckets are contiguous in score per group: max(head) < min(middle)…
        for g in ("g1", "g2"):
            spans = {
                r["bucket"]: (r["lo"], r["hi"])
                for r in cut.filter(F.col("lang") == g)
                .groupBy("bucket")
                .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
                .collect()
            }
            assert set(spans) == {1, 2, 3}
            assert spans[1][1] <= spans[2][0] and spans[2][1] <= spans[3][0]
        # labels: bucket 1 = head
        labels = dict(
            cut.select("bucket", "bucket_label").distinct().collect()
        )
        assert labels == {1: "head", 2: "middle", 3: "tail"}
        # descending: the best score moves from tail to head
        top_id = max(rows[:30], key=lambda r: r[2])[0]
        desc = {
            r["doc_id"]: r["bucket_label"]
            for r in quality_buckets(
                df, "score", mode="cutoff", ascending=False
            ).collect()
        }
        assert desc[top_id] == "head" and got[top_id] == 3
        # scale posture: no sort of the corpus side in the cutoff plan
        plan = cut._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    finally:
        cut.unpersist()


def test_token_budget_sample(spark):
    """Greedy token-budget fill: admission order is the portable hash rank,
    the budget-crossing doc is admitted, everything after is not; per-group
    independence; partitioning-invariant; budget ≥ group total admits all."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.corpus import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "g1", "w " * (i + 1)) for i in range(6)]       # 1..6 tokens
        + [(10, "g2", "a b c"), (11, "g2", "d e")],
        "doc_id bigint, source string, text string",
    )
    out = token_budget_sample(docs, budget_tokens=8).collect()
    got = {(r["source"], r["doc_id"]): r["n_tokens"] for r in out}
    # reconstruct the expected greedy fill from the same hash order
    from heliport_spark.operators.dedup import h60

    order = {
        s: [r["doc_id"] for r in docs.filter(F.col("source") == s)
            .select("doc_id", h60(F.col("doc_id").cast("string")).alias("h"))
            .orderBy("h", "doc_id").collect()]
        for s in ("g1", "g2")
    }
    toks = {i: i + 1 for i in range(6)} | {10: 3, 11: 2}
    want = {}
    for s, ids in order.items():
        cum = 0
        for d in ids:
            if cum < 8:
                want[(s, d)] = toks[d]
            cum += toks[d]
    assert got == want
    # g2 total is 5 < 8 → the whole group admitted
    assert {(s, d) for (s, d) in got if s == "g2"} == {("g2", 10), ("g2", 11)}
    b = {
        (r["source"], r["doc_id"]): r["n_tokens"]
        for r in token_budget_sample(docs.repartition(7), budget_tokens=8).collect()
    }
    assert b == got


def test_remove_boilerplate_lines(spark):
    """CCNet-style line dedup: a line in ≥ min_docs distinct docs is removed
    from EVERY doc, surviving lines keep their original order, a doc whose
    every line is boilerplate survives as '', and a line repeated WITHIN one
    doc counts that doc once (kept, both copies). Partitioning-invariant."""
    from heliport_spark.operators.corpus import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha\ncookie banner\nbeta"),
            (2, "cookie banner\ngamma"),
            (3, "delta\ncookie banner"),
            (4, "unique only"),
            (5, "cookie banner"),
            (6, "solo\nsolo"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(docs).collect()
    }
    assert out == {
        1: ("alpha\nbeta", 3, 1),
        2: ("gamma", 2, 1),
        3: ("delta", 2, 1),
        4: ("unique only", 1, 0),
        5: ("", 1, 1),          # all-boilerplate doc survives, empty
        6: ("solo\nsolo", 2, 0),  # within-doc repeat is NOT cross-doc
    }
    again = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(docs.repartition(7)).collect()
    }
    assert again == out
    # min_docs=4: only the 4-doc banner is hot; 3-doc lines would survive
    strict = {
        r["doc_id"]: r["n_removed"]
        for r in remove_boilerplate_lines(docs, min_docs=5).collect()
    }
    assert strict == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0}


def test_remove_boilerplate_paragraphs(spark):
    """unit="paragraph" (RefinedWeb paragraph-scope dedup): a shared
    multi-line footer BLOCK is removed as one unit, a single line shared
    across docs but embedded in DIFFERENT paragraphs is NOT removed (the
    paragraph is the unit of comparison, not the line), and blank-line
    runs with stray whitespace still separate paragraphs."""
    from heliport_spark.operators.corpus import remove_boilerplate_lines

    footer = "follow us\non all networks"
    docs = spark.createDataFrame(
        [
            (1, f"body one\nstill body one\n\n{footer}"),
            (2, f"body two\n\n{footer}"),
            # shares the LINE "still body one" inside a different paragraph
            (3, "intro three\nstill body one\n \n outro three"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(docs, unit="paragraph").collect()
    }
    assert out == {
        1: ("body one\nstill body one", 2, 1),
        2: ("body two", 2, 1),
        3: ("intro three\nstill body one\n\n outro three", 2, 0),
    }
    # line mode on the same docs DOES remove the shared line — the two
    # granularities are genuinely different signals
    line_out = {
        r["doc_id"]: r["n_removed"]
        for r in remove_boilerplate_lines(docs, unit="line").collect()
    }
    assert line_out[1] >= 1 and line_out[3] >= 1
    with pytest.raises(ValueError):
        remove_boilerplate_lines(docs, unit="sentence")


def test_pack_sequences(spark):
    """Concatenate-and-chunk packing: seq_id is the window of the doc's
    first token, seq_off the offset inside it, groups pack independently,
    long docs spill across windows, and the assignment is invariant under
    physical repartitioning."""
    from heliport_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "g1", "w " * 3),
            (2, "g1", "w " * 5),
            (3, "g1", "w " * 4),
            (4, "g1", "w " * 2),
            (10, "g2", "w " * 15),   # spans windows 0..2 on its own
            (11, "g2", "w " * 1),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_off"], r["n_tokens"])
        for r in pack_sequences(docs, seq_len=6).collect()
    }
    assert out == {
        1: (0, 0, 3),
        2: (0, 3, 5),    # crosses into window 1; first token in window 0
        3: (1, 2, 4),
        4: (2, 0, 2),
        10: (0, 0, 15),
        11: (2, 3, 1),   # 15 tokens = windows 0,1 + 3 into window 2
    }
    again = {
        r["doc_id"]: (r["seq_id"], r["seq_off"], r["n_tokens"])
        for r in pack_sequences(docs.repartition(5), seq_len=6).collect()
    }
    assert again == out


def test_decontaminate_bloom_superset_of_exact(spark):
    """Bloom decontamination can only ADD false positives, never lose a
    contaminated doc: at a generous m_bits the id set equals the exact
    operator's; per-id the maybe-count bounds the exact shared count from
    above; a saturated tiny filter flags every doc with ≥1 gram (the FP
    direction, proving the filter is actually probabilistic)."""
    from heliport_spark.operators.corpus import decontaminate, decontaminate_bloom

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            (3, "entirely disjoint vocabulary nothing shared here at all"),
            (4, "the quick brown fox sat still"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high"),
         (101, "pack my box with five dozen eggs")],
        "doc_id bigint, text string",
    )
    exact = {r["id"]: r["n_shared"]
             for r in decontaminate(corpus, bench, n=4).collect()}
    bloom = {r["id"]: r["n_maybe_shared"]
             for r in decontaminate_bloom(corpus, bench, n=4,
                                          m_bits=1 << 20).collect()}
    assert set(exact) <= set(bloom)
    assert all(bloom[i] >= exact[i] for i in exact)
    # generous filter on a tiny gram set: no false positives in practice
    assert set(bloom) == set(exact)
    # saturated filter (64 bits, 32 hashes → bench grams set ~every bit):
    # even the fully-disjoint doc 3 is flagged — the FP direction, proving
    # the filter is actually probabilistic rather than an exact join
    sat = {r["id"] for r in
           decontaminate_bloom(corpus, bench, n=4, m_bits=64, k=32).collect()}
    assert sat == {1, 2, 3, 4}


def test_temperature_resample_flattens_and_is_invariant(spark):
    """alpha<1 must flatten the skewed language mix (dominant language's
    share shrinks, rarest grows), quotas never exceed group sizes, and the
    picked rows are identical under a different physical layout."""
    from heliport_spark.operators.corpus import temperature_resample

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    before = {r["lang"]: r["n"] for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = temperature_resample(d, total=200)
    after = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_tot, a_tot = sum(before.values()), sum(after.values())
    assert a_tot <= 200
    top = max(before, key=before.get)
    rare = min(before, key=before.get)
    assert after[top] / a_tot < before[top] / n_tot        # flattened
    assert after[rare] / a_tot > before[rare] / n_tot
    assert all(after[g] <= before[g] for g in after)       # never upsamples
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, temperature_resample(d.repartition(13), total=200).collect()))
    assert a == b


def test_decontaminate_never_forces_broadcast(spark):
    """The benchmark gram set scales with the benchmark corpus; nothing may
    FORCE a broadcast (same rule as the dedup/ANN verify paths)."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.corpus import decontaminate

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        q = decontaminate(
            d.filter(F.col("doc_id") % 11 != 0),
            d.filter(F.col("doc_id") % 11 == 0),
            n=4,
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_simhash_pairs_exact_vs_bruteforce(spark):
    """Banded simhash pairing is EXACT for max_hamming <= bands-1
    (pigeonhole: <=3 differing bits leave one of 4 bands intact) — verify
    against an all-pairs popcount over the full sf0.01 signature set."""
    from itertools import combinations

    from heliport_spark.operators.dedup import (
        SIMHASH_BANDS,
        simhash,
        simhash_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sigs = {r["id"]: r["simhash"] for r in simhash(d).collect()}
    k = SIMHASH_BANDS - 1
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= k
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(d).collect()
    }
    assert got == expect
    assert expect  # the synthetic corpus must actually exercise the operator


def test_ivf_fit_sample_bounded(spark):
    """The k-means coarse-quantizer fit must train on a BOUNDED sample, not
    the full corpus (VERDICT r02 #1): at 100 TB a 20-iteration full-corpus
    fit is 20 full passes. Since r7 the sample is bottom-k by per-row hash
    (VERDICT r6 #5): EXACTLY the budget in ONE scan (TakeOrderedAndProject
    — per-partition heaps, no count pre-pass, no full sort), deterministic
    regardless of partitioning."""
    from heliport_spark.operators.similarity import _ivf_fit_sample

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        F.col("embedding").alias("u")
    )
    total = e.count()
    budget = max(20, total // 10)
    samp = _ivf_fit_sample(e, budget, seed=42)
    assert samp.count() == budget  # exact, not concentrated-around
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k heaps, not a global sort
    # partitioning-invariant: same rows whatever the input layout
    a = sorted(map(str, samp.collect()))
    b = sorted(map(str, _ivf_fit_sample(e.repartition(7), budget,
                                        seed=42).collect()))
    assert a == b
    # under-budget corpora come back whole
    assert _ivf_fit_sample(e, total + 1, seed=42).count() == total


def test_ivf_prefit_quantizer_identical(spark):
    """ivf_ann_topk(..., quantizer=prefit) must return exactly what the
    internal fit returns (same seed/sample → same centroids) — the
    fit-once/serve-many path at scale."""
    from heliport_spark.operators.similarity import fit_ivf_quantizer, ivf_ann_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.limit(5)
    a = sorted(map(tuple, ivf_ann_topk(e, q, k=3).collect()))
    m = fit_ivf_quantizer(e)
    b = sorted(map(tuple, ivf_ann_topk(e, q, k=3, quantizer=m).collect()))
    assert a == b and len(a) > 0


def test_ivf_survives_zero_norm_embedding(spark):
    """An all-zero embedding must not crash KMeans.fit (the L2-normalize
    used to emit NULL features via nullif; ADVICE r02): the quantizer falls
    back to the raw zero vector."""
    import numpy as np
    from pyspark.sql import functions as F

    from heliport_spark.operators.similarity import ivf_ann_topk

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(49)]
    rows.append((49, [0.0] * 16))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(4)
    q = e.filter(F.col("vec_id") < 2)
    out = ivf_ann_topk(e, q, k=2, n_centroids=4, n_probe=2)
    assert out.count() > 0


def test_ann_scale_paths_recall_floor(spark):
    """Recall floors for the ANN scale paths (rows-only in the driver
    contract precisely because recall < 1).

    Two regimes: (a) the driver's near-random synthetic embeddings — only a
    loose floor is meaningful there (sign-LSH per-bit agreement is ~0.55 on
    uncorrelated vectors); (b) planted-neighbor data (clusters of perturbed
    copies — the regime ANN is actually for), where both paths must recover
    most of the true top-k."""
    import numpy as np
    from pyspark.sql import functions as F

    from heliport_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        ivfpq_ann_topk,
        lsh_ann_topk,
    )

    def recall(approx_df, exact_set):
        got = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
        return len(got & exact_set) / len(exact_set)

    # (a) driver embeddings: loose floors
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=5).collect()
    }
    assert recall(ivf_ann_topk(e, q, k=5, n_probe=4), exact) >= 0.5
    # IVF-PQ: the hard-regime loss is the COARSE PROBE, not the 8 B code —
    # with single assignment the n_probe=4 exact-distance ceiling is 0.540
    # and ADC scores the same 0.540 (rotation/residual codebooks were
    # prototyped and cannot help; see ivfpq_ann_topk docstring). Multi-
    # assignment (each vector indexed in its `assign` nearest cells) is
    # what moves it: measured 0.54 / 0.62 / 0.76 at assign=1/2/3. Floors
    # one notch under the deterministic measurements (VERDICT r6 next #2:
    # ≥0.65 at the same 8 B codes — assign=3 clears it with margin).
    assert recall(
        ivfpq_ann_topk(e, q, k=5, n_probe=4, rerank=32, assign=1), exact
    ) >= 0.5
    pq_default = ivfpq_ann_topk(e, q, k=5, n_probe=4, rerank=32)
    assert recall(pq_default, exact) >= 0.6
    # replica collisions must never surface as duplicate output pairs
    pairs = [(r["query_id"], r["neighbor_id"]) for r in pq_default.collect()]
    assert len(pairs) == len(set(pairs))
    assert recall(
        ivfpq_ann_topk(e, q, k=5, n_probe=4, rerank=32, assign=3), exact
    ) >= 0.65
    # 8 tables + Hamming-1 multiprobe (the defaults) measure 0.64 here —
    # deterministic planes + fixture, so 0.5 is a falsifiable floor
    # (VERDICT r03 #2: the old 0.05 floor passed for a broken operator)
    assert recall(lsh_ann_topk(e, q, k=5), exact) >= 0.5
    # exact-bucket probing must still work (and recalls strictly less)
    assert recall(lsh_ann_topk(e, q, k=5, multiprobe=0), exact) >= 0.15

    # (b) planted clusters: 100 bases x 4 noisy copies, dim 64
    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 64))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):
            v = b + 0.15 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    pe = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    pq = pe.filter(F.col("vec_id") % 40 == 0).limit(10)
    pexact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(pe, pq, k=3).collect()
    }
    assert recall(ivf_ann_topk(pe, pq, k=3, n_probe=4), pexact) >= 0.6
    assert recall(lsh_ann_topk(pe, pq, k=3), pexact) >= 0.6
    # planted structure is the regime PQ codes preserve well
    assert recall(ivfpq_ann_topk(pe, pq, k=3, n_probe=4), pexact) >= 0.6


def test_ann_ivfpq_codes_and_prefit(spark):
    """IVF-PQ structural contract: (a) the encoded corpus is
    (id, int centroid, ONE bigint code) — 12 B/row vs 256 B of float32
    vector, the 100 TB shuffle-feasibility claim; (b) a prefit model
    (fit_ivfpq) reproduces the internal-fit result exactly (the
    fit-offline/serve-many path); (c) sub-codes stay within k_sub so the
    byte packing is lossless."""
    from pyspark.sql import functions as F

    from heliport_spark.operators.similarity import (
        PQ_KSUB,
        PQ_M,
        fit_ivfpq,
        ivfpq_ann_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    model = fit_ivfpq(e)
    coarse, books = model
    assert books.shape == (PQ_M, PQ_KSUB, 64 // PQ_M)
    a = sorted(map(tuple, ivfpq_ann_topk(e, q, k=3, n_probe=4).collect()))
    b = sorted(map(tuple, ivfpq_ann_topk(e, q, k=3, n_probe=4,
                                         model=model).collect()))
    assert a == b and len(a) == 30
    # every sub-code must stay < k_sub so the byte packing is lossless —
    # re-derive assignments from the model's codebooks the way encode does
    import numpy as np

    B = books
    V = np.asarray(
        [r["embedding"] for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    nrm = np.sqrt((V * V).sum(1, keepdims=True))
    U = np.divide(V, nrm, out=np.zeros_like(V), where=nrm > 0)
    dsub = 64 // PQ_M
    for j in range(PQ_M):
        sub = U[:, j * dsub:(j + 1) * dsub]
        cb = B[j]
        assign = (
            (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T)
            + (cb * cb).sum(1)[None]
        ).argmin(1)
        assert assign.max() < PQ_KSUB <= 256


def test_embedding_neardup_bucketed_recall(spark):
    """The bucketed embedding_neardup scale path (sign-LSH prefilter + exact
    cosine verify) pinned against the exhaustive O(n²) pair set — VERDICT
    r03 #1: this operator previously had zero verification.

    Two regimes, both deterministic (fixed planes, fixed fixtures):
    (a) sf0.01 embeddings at threshold 0.4 — near-random vectors, the hard
        prefilter regime (per-bit collision p≈0.6): 8 tables measure 0.458;
    (b) planted tight near-dups at the operator's intended threshold 0.95
        (p≈0.97 per bit): default 4 tables measure recall 1.0.
    Precision is 1.0 by construction (exact verify) — asserted too."""
    import numpy as np
    from pyspark.sql import functions as F

    from heliport_spark.operators.similarity import cosine_expr, embedding_neardup

    def exhaustive(df, th):
        a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        return {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("sim", F.round(cosine_expr(F.col("va"), F.col("vb")), 4))
            .filter(F.col("sim") >= th)
            .select("id_a", "id_b")
            .collect()
        }

    # (a) hard regime: driver embeddings, low threshold
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = exhaustive(e, 0.4)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(e, threshold=0.4, n_tables=8).collect()
    }
    assert got <= exact  # exact verify ⇒ no false positives
    assert len(got & exact) / len(exact) >= 0.4

    # (b) intended regime: tight planted near-dup pairs at threshold 0.95
    rng = np.random.default_rng(13)
    rows, vid = [], 0
    for base in rng.standard_normal((150, 64)):
        for _ in range(2):
            v = base + 0.03 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    ne = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    nexact = exhaustive(ne, 0.95)
    ngot = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(ne, threshold=0.95).collect()
    }
    assert len(nexact) >= 100  # the fixture genuinely plants near-dups
    assert ngot <= nexact
    assert len(ngot & nexact) / len(nexact) >= 0.95

    # (b') scale sizing (VERDICT r04 #5): the docstring rule says grow
    # n_planes ≈ log2(n) − log2(target_occupancy) as the corpus grows; at
    # threshold 0.95 the per-bit collision p≈0.97, so going 6 → 8 planes
    # (4× fewer docs/bucket) costs ≈p² ≈ 6% per-table recall, recovered by
    # the 4-table OR — the planted floor must hold at the scaled-up planes.
    ngot8 = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(ne, threshold=0.95, n_planes=8).collect()
    }
    assert ngot8 <= nexact
    assert len(ngot8 & nexact) / len(nexact) >= 0.95


def test_hot_bucket_cap_bounds_pair_emission(spark):
    """VERDICT r04 #1: a duplicate-heavy corpus puts the whole pile behind
    one (band, sig) bucket — uncapped, every batch banded self-join emits
    O(bucket²) pairs (THE classic LSH blowup at 100 TB). The MAX_BUCKET cap
    must (a) bound emission to C(k,2) + (n−k) per bucket, (b) keep every
    member CONNECTED through the bucket representative (so clustering still
    collapses the pile), and (c) leave sub-cap corpora byte-identical
    (covered separately by the sf0.01 oracle rows staying green)."""
    from heliport_spark.operators.dedup import (
        MAX_BUCKET,
        dup_clusters,
        minhash_lsh_candidates,
        simhash_pairs,
    )

    n = 1000
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], ["doc_id", "text"]
    ).repartition(8)

    k = MAX_BUCKET
    capped_expected = k * (k - 1) // 2 + (n - k)

    pairs = minhash_lsh_candidates(df)
    assert pairs.count() == capped_expected
    # connectivity: the exact-dup pile still collapses to ONE cluster with
    # the min id canonical — the representative links do the linking
    cl = dup_clusters(pairs).groupBy("cluster_id").count().collect()
    assert len(cl) == 1 and cl[0]["count"] == n and cl[0]["cluster_id"] == 0
    # the uncapped join really would emit the quadratic pair set
    assert minhash_lsh_candidates(df, max_bucket=None).count() == n * (n - 1) // 2

    # simhash: identical docs ⇒ identical signatures ⇒ hamming 0 — every
    # capped candidate survives the verify, same bounded shape
    sp = simhash_pairs(df)
    assert sp.count() == capped_expected
    assert sp.filter("hamming != 0").count() == 0


def test_capped_bucket_pairs_semantics(spark):
    """First-k-by-id + representative-link semantics on one explicit bucket:
    5 members, cap 2 ⇒ {(0,1)} within + {(0,2),(0,3),(0,4)} overflow links."""
    from heliport_spark.operators.dedup import capped_bucket_pairs

    e = spark.createDataFrame(
        [(i, "b0") for i in range(5)] + [(9, "b1")], ["id", "bucket"]
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in capped_bucket_pairs(e, ["bucket"], max_bucket=2).collect()
    }
    assert got == {(0, 1), (0, 2), (0, 3), (0, 4)}


def test_embedding_neardup_capped_bucket(spark):
    """The embedding sign-LSH join inherits the cap: a pile of identical
    vectors (one degenerate bucket in EVERY table) emits the bounded pair
    set, and the cosine verify keeps the representative links (sim=1.0)."""
    from heliport_spark.operators.dedup import MAX_BUCKET
    from heliport_spark.operators.similarity import embedding_neardup

    import numpy as np

    rng = np.random.default_rng(7)
    base = [float(x) for x in rng.standard_normal(64)]
    n = 300
    e = spark.createDataFrame(
        [(i, base) for i in range(n)], ["vec_id", "embedding"]
    ).repartition(8)
    cap = 64
    out = embedding_neardup(e, threshold=0.95, max_bucket=cap)
    assert out.count() == cap * (cap - 1) // 2 + (n - cap)
    assert MAX_BUCKET >= 2  # the default cap the scale paths rely on


def test_winnow_fingerprints_match_naive_moss(spark):
    """Engine winnowing ≡ a from-scratch MOSS implementation (Schleimer et
    al. '03: per-window min hash, rightmost on ties) on normalization edge
    cases: extra whitespace/case (1≡2), shorter-than-k, empty, all-equal
    grams (pure tie-break), and < w grams (whole-doc fallback window)."""
    import hashlib
    import re

    from heliport_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "  The   QUICK brown fox jumps over the lazy dog  "),
        (3, "abc"),
        (4, ""),
        (5, "aaaaaaaaaaaaaaa"),
        (6, "unrelated body that also ends with the lazy dog"),
        (7, "sevench"),  # 7 chars → 3 grams < w: fallback window only
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = sorted(tuple(r) for r in winnow_fingerprints(df).collect())

    def naive(doc_id, text, k=WINNOW_K, w=WINNOW_W):
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        ng = max(len(norm) - (k - 1), 1)
        keyed = [
            (i, int(hashlib.md5(norm[i - 1:i - 1 + k].encode()).hexdigest()[:10], 16))
            for i in range(1, ng + 1)
        ]
        pos_max = (1 << 20) - 1
        out = set()
        for end in range(len(keyed)):
            if not (end + 1 >= w or end + 1 == ng):
                continue
            window = keyed[max(0, end - (w - 1)):end + 1]
            best = min(window, key=lambda t: (t[1] << 20) + (pos_max - t[0]))
            out.add((doc_id, best[0], best[1]))
        return out

    ref = sorted(x for d, t in texts for x in naive(d, t))
    assert got == ref
    # docs 1 and 2 normalize identically ⇒ identical fingerprint sets
    by_id = {}
    for d, p, fp in got:
        by_id.setdefault(d, set()).add((p, fp))
    assert by_id[1] == by_id[2]


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: ANY shared substring of >= w + k - 1 chars
    yields a shared selected fingerprint value — checked by planting an
    8-char phrase in otherwise-disjoint docs. Density: the selected count
    stays near the expected 2/(w+1) fraction of grams on random text."""
    import random

    from heliport_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    assert WINNOW_W + WINNOW_K - 1 == 8
    rng = random.Random(13)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    planted = "lazy dog"  # exactly the w+k-1 guarantee threshold
    rows = []
    for d in range(10):
        junk = "".join(rng.choice(alpha) for _ in range(120))
        mid = rng.randrange(20, 100)
        rows.append((d, junk[:mid] + planted + junk[mid:]))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(df, min_shared=1).collect()
    }
    for a in range(10):
        for b in range(a + 1, 10):
            assert (a, b) in pairs, (a, b)

    n_sel = winnow_fingerprints(df).count()
    n_grams = sum(len(t) - (WINNOW_K - 1) for _, t in rows)
    density = n_sel / n_grams
    # expectation 2/(w+1) = 0.4; duplicate-value collapse pulls it down,
    # boundary windows push it up — wide but falsifiable band
    assert 0.2 < density < 0.6, density


def test_winnow_overlap_capped_bucket(spark):
    """A corpus-wide hot fingerprint (one boilerplate string in every doc)
    goes through the MAX_BUCKET cap: bounded pair emission with the
    first-k + representative-link shape, not O(n^2)."""
    from heliport_spark.operators.dedup import winnow_overlap_pairs

    n, cap = 300, 64
    text = "identical boilerplate sentence repeated across the whole corpus"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], ["doc_id", "text"]
    ).repartition(8)
    out = winnow_overlap_pairs(df, min_shared=1, max_bucket=cap)
    # every fingerprint value is one degenerate bucket with the same
    # membership ⇒ pair-count per bucket = C(cap,2) + (n-cap); the groupBy
    # collapses buckets into n_shared multiplicity, so distinct pairs match
    # ONE bucket's shape
    assert out.count() == cap * (cap - 1) // 2 + (n - cap)
    assert out.filter("id_a != 0").count() == cap * (cap - 1) // 2 - (cap - 1)


def test_winnow_shared_spans_planted(spark):
    """Span extraction finds WHERE a planted paragraph is shared: offsets
    land inside the plant (up to the documented w+k sampling slack per
    side), the delta between a_off and b_off equals the true offset shift,
    coverage spans most of the plant, and unrelated doc pairs emit no
    span. A doc sharing the SAME paragraph at TWO positions yields spans
    at two distinct deltas."""
    from heliport_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_shared_spans,
    )

    shared = ("this exact boilerplate paragraph appears in both documents "
              "word for word with identical characters throughout")
    pre_a = "alpha opening text before the copied region starts here "
    pre_b = ("totally different beta preamble of another length entirely "
             "precedes the copied region in the second document ")
    post = " and afterwards the texts diverge into unrelated content again"
    doc_a = pre_a + shared + post + " extra a"
    doc_b = pre_b + shared + post.upper().lower() + " other b"
    doc_c = "an unrelated third document with none of the planted text"
    # doc_d: the shared paragraph TWICE (two alignments vs doc_a)
    doc_d = "short head " + shared + " middle filler words here " + shared
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c), (4, doc_d)],
        ["doc_id", "text"],
    )
    rows = winnow_shared_spans(df).collect()
    slack = WINNOW_W + WINNOW_K
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r)
    # the unrelated doc shares only incidental short word-runs (k=5 makes
    # any shared ≥ w+k−1 = 8-char run findable — that's the guarantee, not
    # a bug): every span involving it stays short
    for p, spans in by_pair.items():
        if 3 in p:
            assert max(r["span_len"] for r in spans) < 30
    # pair (1,2): one dominant span over the plant (+ the shared `post`
    # tail continues at the same delta, so the span extends into it)
    spans_ab = by_pair[(1, 2)]
    main = max(spans_ab, key=lambda r: r["span_len"])
    a_true, b_true = len(pre_a) + 1, len(pre_b) + 1  # 1-based offsets
    assert abs(main["a_off"] - a_true) <= slack
    assert abs(main["b_off"] - b_true) <= slack
    # both docs continue identically through `post`: delta is exact even
    # where the edges wobble
    assert main["a_off"] - main["b_off"] == a_true - b_true
    assert main["span_len"] >= len(shared) - 2 * slack
    # pair (1,4): two alignments of the twice-planted paragraph = two
    # LONG spans at distinct deltas
    deltas_ad = {
        r["a_off"] - r["b_off"]
        for r in by_pair[(1, 4)]
        if r["span_len"] >= len(shared) - 2 * slack
    }
    assert len(deltas_ad) >= 2


def test_dsir_resample_prefers_target_like_docs(spark):
    """DSIR (Xie et al. 2023): with the Gopher keep predicate as target,
    docs built from the target family's vocabulary outrank salad docs
    whose bigrams never appear in the target subset — even though BOTH
    families are in the raw corpus. Deterministic across partitioning."""
    from heliport_spark.operators.corpus import dsir_resample

    # target-like: fluent 12-word sentences (pass Gopher: >=10 words,
    # stopwords present); salad: same LENGTH (also pass/fail Gopher is
    # irrelevant — the DISTRIBUTION drives the score) but from a disjoint
    # rare-token vocabulary with no stopwords, so Gopher marks them
    # non-target and their bigrams get negative log-ratios
    rows = []
    for i in range(30):
        rows.append((i, f"the cat and the dog walked to the old town gate {i % 3}"))
    for i in range(30, 60):
        rows.append((i, f"zorblat quixfen vermblox kraggle znorp wibblet "
                        f"drangle fexxo blun klap trizzet {i % 3}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sel = {r["doc_id"] for r in dsir_resample(docs, n_select=20).collect()}
    assert sel <= set(range(30)), "a salad doc out-ranked the target family"
    again = {
        r["doc_id"]
        for r in dsir_resample(docs.repartition(7), n_select=20).collect()
    }
    assert again == sel


def test_remove_shared_spans_semantics(spark):
    """The span scrubber: overlapping/duplicate intervals merge before
    removal, spans at the very start/end truncate cleanly, the canonical
    (id_a) side is never touched, span-free docs pass through with their
    normalized text, and normalization (strip/lower/ws-collapse) is the
    winnowing one."""
    from heliport_spark.operators.dedup import remove_shared_spans

    docs = spark.createDataFrame(
        [
            (1, "AAAA bbbb cccc dddd"),
            (2, "  Xxxx bbbb  cccc yyyy  "),
            (3, "untouched document"),
        ],
        ["doc_id", "text"],
    )
    # normalized doc 2 = "xxxx bbbb cccc yyyy" (19 chars)
    # two overlapping spans [6,11) + [9,16) merge to [6,16); a duplicate
    # of the first and a tail span [18,20) exercise dedup + end truncation
    spans = spark.createDataFrame(
        [
            (1, 2, 6, 6, 5, 2),
            (1, 2, 6, 6, 5, 2),   # duplicate interval
            (1, 2, 9, 9, 7, 2),   # overlaps -> merged [6,16)
            (1, 2, 1, 18, 2, 2),  # tail span [18,20)
        ],
        ["id_a", "id_b", "a_off", "b_off", "span_len", "n_fps"],
    )
    out = {r["doc_id"]: r.asDict()
           for r in remove_shared_spans(docs, spans).collect()}
    # kept: [1,6)="xxxx " + [16,18)="yy" (tail [20,..) is empty)
    assert out[2]["text_clean"] == "xxxx yy"
    assert out[2]["n_spans"] == 2 and out[2]["chars_removed"] == 12
    assert out[1]["text_clean"] == "aaaa bbbb cccc dddd"
    assert out[1]["n_spans"] == 0 and out[1]["chars_removed"] == 0
    assert out[3]["text_clean"] == "untouched document"


def test_remove_shared_spans_randomized_vs_python(spark):
    """Differential test: 120 random docs × random (possibly overlapping,
    duplicated, touching, start/end-hugging) interval lists, Spark output
    ≡ a 10-line python reference scrubber on the normalized text."""
    import re

    rng = np.random.default_rng(77)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    docs, spans = [], []
    for d in range(120):
        n = int(rng.integers(3, 30))
        text = " ".join(rng.choice(words, size=n))
        if rng.random() < 0.3:  # exercise the normalizer
            text = "  " + text.upper() + "  "
        docs.append((d, text))
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        L = len(norm)
        for _ in range(int(rng.integers(0, 5))):
            off = int(rng.integers(1, max(2, L)))
            ln = int(rng.integers(1, max(2, L - off + 2)))
            spans.append((0, d, 1, off, ln, 2))
            if rng.random() < 0.3:
                spans.append((0, d, 1, off, ln, 2))  # duplicate
    from heliport_spark.operators.dedup import remove_shared_spans

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    pdf = spark.createDataFrame(
        spans, ["id_a", "id_b", "a_off", "b_off", "span_len", "n_fps"]
    )
    got = {r["doc_id"]: (r["text_clean"], r["n_spans"], r["chars_removed"])
           for r in remove_shared_spans(sdf, pdf).collect()}

    by_doc: dict = {}
    for _, d, _, off, ln, _ in spans:
        by_doc.setdefault(d, set()).add((off, off + ln))
    for d, text in docs:
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        iv = sorted(by_doc.get(d, ()))
        merged = []
        for off, end in iv:
            if merged and off <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], end)
            else:
                merged.append([off, end])
        kept, prev = [], 1
        for off, end in merged:
            kept.append(norm[prev - 1:off - 1])
            prev = end
        kept.append(norm[prev - 1:])
        expect = "".join(kept)
        removed = sum(e - o for o, e in merged)
        assert got[d] == (expect, len(merged), removed), f"doc {d}"


def test_quality_scores_robust_on_arbitrary_text():
    """The classifier serve path never crashes and stays in [0,1] on
    arbitrary unicode / degenerate inputs."""
    from heliport_spark.quality_train import (
        load_quality_params,
        quality_scores,
    )

    w, dw, b, _ = load_quality_params()
    texts = [
        "", " ", "\n\t ", None, "a", "🎉🎊✨" * 50, "ß" * 2000,
        "\x00\x01", "日本語のテキストです", "x " * 5000,
        "MiXeD CaSe WoRdS everywhere", "1234 5678 9012",
    ]
    s = quality_scores(texts, w, dw, b)
    assert len(s) == len(texts)
    assert ((s >= 0.0) & (s <= 1.0)).all()
    assert s[0] == 0.0 and s[3] == 0.0  # empty/None score 0


def test_cross_corpus_candidates_and_incremental_dedup(spark):
    """Two-corpus dedup: new docs duplicating a reference doc are flagged
    (and dropped by incremental_dedup); genuinely novel docs survive. The
    candidate set must equal the cross-corpus restriction of the single-
    corpus LSH over the union — same bands, same signatures."""
    from heliport_spark.operators.dedup import (
        cross_corpus_candidates,
        incremental_dedup,
        minhash_lsh_candidates,
    )

    ref_rows = [
        (100, "the quick brown fox jumps over the lazy dog every single day"),
        (101, "spark partitions shuffle data across the cluster by key hash"),
        (102, "completely unrelated reference document about audio codecs"),
    ]
    new_rows = [
        (1, "the quick brown fox jumps over the lazy dog every single day"),
        (2, "spark partitions shuffle data across the cluster by key hash!"),
        (3, "a genuinely novel document with entirely fresh content inside"),
    ]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    cand = {
        (r.id_new, r.id_ref)
        for r in cross_corpus_candidates(new, ref).collect()
    }
    union_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(ref.unionByName(new)).collect()
    }
    expected = {
        (a, b) for a, b in union_pairs if a < 100 <= b
    }
    assert cand == expected
    assert (1, 100) in cand  # exact duplicate must always be flagged

    kept = {r.doc_id for r in incremental_dedup(new, ref).collect()}
    assert 1 not in kept
    assert 3 in kept


def test_cross_corpus_hot_bucket_cap_and_gate_exactness(spark):
    """Degenerate bucket (every doc identical on both sides): the pair list
    is capped at k·k + (n_new − k) representative links, while the
    incremental_dedup GATE stays bit-identical to uncapped — every new
    member of the hot bucket is dropped."""
    from heliport_spark.operators.dedup import (
        LSH_BANDS,
        cross_corpus_candidates,
        incremental_dedup,
    )

    text = "one boilerplate page duplicated across crawl snapshots forever"
    n_new, n_ref, cap = 200, 150, 16
    new = spark.createDataFrame(
        [(i, text) for i in range(n_new)], ["doc_id", "text"]
    ).repartition(8)
    ref = spark.createDataFrame(
        [(10_000 + i, text) for i in range(n_ref)], ["doc_id", "text"]
    ).repartition(8)

    pairs = cross_corpus_candidates(new, ref, max_bucket=cap)
    # identical text ⇒ every band collapses to the same bucket; distinct
    # pair count = k·k (kept×kept) + (n_new−k) overflow→representative
    assert pairs.count() == cap * cap + (n_new - cap)
    # overflow links go to the bucket's first ref id only
    over = pairs.filter(f"id_new >= {cap}")
    assert over.filter("id_ref != 10000").count() == 0

    assert incremental_dedup(new, ref).count() == 0


def test_speech_segments_merge_semantics():
    """Pure VAD merge: gap bridging at ≤ max_gap, run-length floor, empty
    and all-speech masks."""
    import numpy as np

    from heliport_spark.functions.audio import speech_segments

    m = np.array([0, 1, 1, 0, 1, 1, 0, 0, 0, 1, 1, 1], dtype=bool)
    # gap of 1 silent frame between (1,3) and (4,6) bridges at max_gap=1;
    # the 3-frame gap to (9,12) does not
    assert speech_segments(m, 2, 1) == [(1, 6), (9, 12)]
    # no bridging at max_gap=0
    assert speech_segments(m, 2, 0) == [(1, 3), (4, 6), (9, 12)]
    # min length drops the short runs entirely
    assert speech_segments(m, 4, 0) == []
    assert speech_segments(np.zeros(8, dtype=bool)) == []
    assert speech_segments(np.ones(8, dtype=bool)) == [(0, 8)]


def _pcm(wave):
    from heliport_spark.functions.audio import encode_pcm_s16le

    return encode_pcm_s16le(wave)


def test_vad_segments_df(spark):
    """Synthetic silence|tone|silence|tone|silence clip → exactly the two
    planted speech segments with sample-accurate millisecond bounds."""
    import numpy as np

    from heliport_spark.functions.audio import vad_segments_df

    sr = 16000
    t = lambda ms: np.arange(int(sr * ms / 1000))
    tone = lambda ms: 0.3 * np.sin(2 * np.pi * 440 * t(ms) / sr)
    sil = lambda ms: np.zeros(int(sr * ms / 1000))
    wave = np.concatenate([sil(500), tone(1000), sil(300), tone(480), sil(200)])
    rows = [
        ("a", _pcm(wave), sr),
        ("b", _pcm(sil(400)), sr),          # all silence: no rows
        ("c", None, sr),                     # NULL bytes: no rows
    ]
    df = spark.createDataFrame(rows, ["clip_id", "bytes", "sr_hz"])
    segs = {
        (r.clip_id, r.seg_idx): (r.start_ms, r.end_ms)
        for r in vad_segments_df(df, codec_col=None).collect()
    }
    assert set(segs) == {("a", 0), ("a", 1)}
    # frame quantization is 20 ms — bounds land on the planted edges
    assert segs[("a", 0)] == (500, 1500)
    assert segs[("a", 1)] == (1800, 2280)


def test_trim_silence_df(spark):
    """Leading/trailing silence stripped with 1 frame of pad; all-speech
    passthrough is byte-identical; all-silence → empty bytes with the
    duration on head trim; undecodable → NULL bytes_trim."""
    import numpy as np

    from heliport_spark.functions.audio import trim_silence_df

    sr = 16000
    t = lambda ms: np.arange(int(sr * ms / 1000))
    tone = lambda ms: 0.3 * np.sin(2 * np.pi * 440 * t(ms) / sr)
    sil = lambda ms: np.zeros(int(sr * ms / 1000))
    speech = tone(600)
    padded = np.concatenate([sil(400), speech, sil(240)])
    rows = [
        ("pad", _pcm(padded), sr, None),
        ("all", _pcm(speech), sr, None),
        ("quiet", _pcm(sil(500)), sr, None),
        ("bad", b"\x00\x01\x02", sr, "wav"),  # malformed WAV container
    ]
    df = spark.createDataFrame(rows, ["clip_id", "bytes", "sr_hz", "codec"])
    got = {r.clip_id: r for r in trim_silence_df(df).collect()}

    frame = sr * 20 // 1000
    r = got["pad"]
    # 400 ms head = 20 frames, minus 1 pad frame → 380 ms trimmed
    assert r.trim_head_ms == 380 and r.trim_tail_ms == 220
    s0 = 19 * frame
    s1 = len(padded) - int(sr * 0.24) + frame
    assert r.bytes_trim == _pcm(padded)[2 * s0 : 2 * s1]
    assert r.n_samples_trim == s1 - s0

    r = got["all"]  # starts and ends in speech: byte-identical passthrough
    assert bytes(r.bytes_trim) == _pcm(speech)
    assert r.trim_head_ms == 0 and r.trim_tail_ms == 0

    r = got["quiet"]
    assert bytes(r.bytes_trim) == b"" and r.n_samples_trim == 0
    assert r.trim_head_ms == 500

    assert got["bad"].bytes_trim is None


def test_spectral_denoise_improves_snr_and_calibration():
    """Spectral subtraction on tone-bursts-in-white-noise: SNR improves by
    ≥ 4 dB at three noise levels, the noise-floor estimate lands within
    1.5 dB of truth (Rayleigh-calibrated percentile), clean-with-pauses
    input passes through at ≥ 60 dB fidelity, and output length always
    equals input length."""
    import numpy as np

    from heliport_spark.functions.audio import snr_db, spectral_denoise

    sr = 16000

    def tone(ms, f=440, amp=0.3):
        t = np.arange(int(sr * ms / 1000))
        return amp * np.sin(2 * np.pi * f * t / sr)

    def sil(ms):
        return np.zeros(int(sr * ms / 1000))

    clean = np.concatenate(
        [sil(400), tone(800), sil(300), tone(600), sil(400)]
    )
    rng = np.random.default_rng(5)
    for nl in (0.02, 0.05, 0.1):
        noisy = clean + nl * rng.standard_normal(len(clean))
        dn, ndb = spectral_denoise(noisy)
        assert len(dn) == len(noisy)
        gain = snr_db(clean, dn) - snr_db(clean, noisy)
        assert gain >= 4.0, (nl, gain)
        assert abs(ndb - 20 * np.log10(nl)) < 1.5, (nl, ndb)

    dn2, _ = spectral_denoise(clean)
    assert snr_db(clean, dn2) >= 60.0
    for n in (0, 100, 511, 512, 513, 1024):
        d, _ = spectral_denoise(clean[:n])
        assert len(d) == n


def test_denoise_audio_df(spark):
    """The Spark wrapper: denoised bytes column appended, source bytes
    untouched, undecodable rows yield NULL bytes_dn, and the per-clip
    noise_db survives the Arrow round trip."""
    import numpy as np

    from heliport_spark.functions.audio import (
        decode_pcm_s16le,
        denoise_audio_df,
        snr_db,
    )

    sr = 16000
    t = np.arange(sr)
    clean = np.concatenate(
        [np.zeros(sr // 4),
         0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr),
         np.zeros(sr // 4)]
    )
    rng = np.random.default_rng(11)
    noisy = clean + 0.05 * rng.standard_normal(len(clean))
    rows = [
        ("n", _pcm(noisy), sr, None),
        ("bad", b"\x00\x01\x02", sr, "wav"),
    ]
    df = spark.createDataFrame(rows, ["clip_id", "bytes", "sr_hz", "codec"])
    got = {r.clip_id: r for r in denoise_audio_df(df).collect()}

    r = got["n"]
    assert bytes(r.bytes) == _pcm(noisy)  # source untouched
    dn = decode_pcm_s16le(bytes(r.bytes_dn))
    assert len(dn) == len(noisy)
    assert snr_db(clean, dn) > snr_db(clean, decode_pcm_s16le(_pcm(noisy)))
    assert abs(r.noise_db - 20 * np.log10(0.05)) < 2.0
    assert got["bad"].bytes_dn is None and got["bad"].noise_db is None


def _speechish(seed, sr=16000, secs=5.0):
    """Broadband 'syllables' — ONE copy of the recipe lives in
    sources/clips.py (the driver fixture uses it too); pure tones are the
    degenerate worst case for fingerprinting (quantized FFT bins collide
    clip-to-clip), so these tests need wide, time-varying spectra."""
    from heliport_spark.sources.clips import speechish_pcm

    return speechish_pcm(seed, sr_hz=sr, secs=secs)


def test_spectral_peaks_and_landmarks():
    """Constellation invariants: determinism, silence emits nothing, repeat
    cap bounds per-hash occurrences, and hashes are translation-invariant
    (shifted audio -> same hashes, t1 shifted by the frame offset)."""
    import numpy as np

    from heliport_spark.functions.audio import (
        FP_HOP,
        FP_MAX_REPEAT,
        landmark_hashes,
        spectral_peaks,
    )

    w = _speechish(5, secs=3.0)
    p1 = spectral_peaks(w)
    p2 = spectral_peaks(w.copy())
    assert np.array_equal(p1, p2)  # deterministic
    assert len(spectral_peaks(np.zeros(16000))) == 0  # silence: no peaks

    lm = landmark_hashes(p1)
    assert len(lm) > 0
    _, counts = np.unique(lm[:, 0], return_counts=True)
    assert counts.max() <= FP_MAX_REPEAT  # in-clip repeat cap holds

    # translation invariance: prepend exactly k hop-aligned frames of the
    # same audio's tail (keeps windows identical for the shifted part)
    k = 8
    shifted = np.concatenate([np.zeros(k * FP_HOP), w])
    lm_s = landmark_hashes(spectral_peaks(shifted))
    h = set(map(tuple, lm + np.array([0, k])))  # expected: t1 += k
    got = set(map(tuple, lm_s))
    # the overlap region's hashes survive the shift (boundary frames differ)
    assert len(h & got) > 0.7 * len(h)


def test_audio_fingerprint_matches(spark):
    """Planted partial overlap: clip b = a 2 s slice of clip a at 0.5 s +
    noise. The landmark vote must find exactly (a, b) at the true frame
    offset with >=5x the vote mass of any false pair; unrelated clips and
    undecodable rows must not match at the default floor."""
    import numpy as np

    from heliport_spark.functions.audio import (
        FP_HOP,
        audio_fingerprints_df,
    )
    from heliport_spark.operators.similarity import audio_fingerprint_matches

    sr = 16000
    rng = np.random.default_rng(0)
    a = _speechish(1)
    off = 8000  # 0.5 s
    b = a[off:off + 2 * sr] + 0.02 * rng.standard_normal(2 * sr)
    c = _speechish(2)
    d = _speechish(3)
    rows = [("a", _pcm(a), "pcm_s16le"), ("b", _pcm(b), "pcm_s16le"),
            ("c", _pcm(c), "pcm_s16le"), ("d", _pcm(d), "pcm_s16le"),
            ("bad", b"\x00\x01", "wav"), ("nul", None, None)]
    df = spark.createDataFrame(rows, ["clip_id", "bytes", "codec"])
    fp = audio_fingerprints_df(df)
    assert fp.filter(fp.id.isin("bad", "nul")).count() == 0

    # at the default floor: exactly the planted pair, at the true offset
    got = audio_fingerprint_matches(fp).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == ("a", "b")
    assert r.offset_frames == off // FP_HOP
    # with the floor off: the true pair's votes dominate every false pair
    allv = {(x.id_a, x.id_b): x.votes
            for x in audio_fingerprint_matches(fp, min_votes=1).collect()}
    false_max = max((v for k, v in allv.items() if k != ("a", "b")), default=0)
    assert allv[("a", "b")] >= 5 * max(false_max, 1)


def test_audio_fingerprint_matches_capped_bucket(spark):
    """A degenerate hash shared by many clips (the audio 'hum' bucket) goes
    through the MAX_BUCKET cap: pair emission stays bounded and the true
    planted pair still surfaces."""
    import numpy as np

    from heliport_spark.functions.audio import audio_fingerprints_df
    from heliport_spark.operators.similarity import audio_fingerprint_matches

    sr = 16000
    # 40 clips all containing the same 440 Hz hum (degenerate bucket),
    # plus a planted copy pair with rich content
    hum = 0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    rows = [(f"h{i}", _pcm(hum), "pcm_s16le") for i in range(40)]
    rich = _speechish(9, secs=3.0)
    rows += [("x", _pcm(rich), "pcm_s16le"),
             ("y", _pcm(rich[:2 * sr]), "pcm_s16le")]
    df = spark.createDataFrame(rows, ["clip_id", "bytes", "codec"])
    fp = audio_fingerprints_df(df)
    m = audio_fingerprint_matches(fp, min_votes=32, max_bucket=4)
    pairs = {(r.id_a, r.id_b) for r in m.collect()}
    assert ("x", "y") in pairs


def test_audio_fingerprint_matches_incremental(spark):
    """Two-corpus matching: new clip b (a noisy 2 s slice of reference clip
    a, sliced at 0.5 s) must match a — and ONLY a — at the true negative
    offset (b's frames sit 31 frames EARLIER than a's); unrelated new clip
    d matches nothing. Hot-bucket representative links (max_bucket=2 with
    40 hum clips on the ref side) must keep the planted hit alive."""
    import numpy as np

    from heliport_spark.functions.audio import FP_HOP, audio_fingerprints_df
    from heliport_spark.operators.similarity import (
        audio_fingerprint_matches_incremental,
    )

    sr = 16000
    rng = np.random.default_rng(0)
    a = _speechish(1)
    off = 8000
    b = a[off:off + 2 * sr] + 0.02 * rng.standard_normal(2 * sr)
    ref_rows = [("a", _pcm(a), "pcm_s16le"), ("c", _pcm(_speechish(2)), "pcm_s16le")]
    new_rows = [("b", _pcm(b), "pcm_s16le"), ("d", _pcm(_speechish(3)), "pcm_s16le")]
    fp_ref = audio_fingerprints_df(
        spark.createDataFrame(ref_rows, ["clip_id", "bytes", "codec"]))
    fp_new = audio_fingerprints_df(
        spark.createDataFrame(new_rows, ["clip_id", "bytes", "codec"]))

    got = audio_fingerprint_matches_incremental(fp_new, fp_ref).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == ("b", "a")
    assert r.offset_frames == -(off // FP_HOP)

    # degenerate ref-side bucket: 40 hum clips + the true reference, tight
    # cap — the planted pair must survive via kept/representative links
    hum = 0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    ref2 = ref_rows + [(f"h{i:02d}", _pcm(hum), "pcm_s16le") for i in range(40)]
    fp_ref2 = audio_fingerprints_df(
        spark.createDataFrame(ref2, ["clip_id", "bytes", "codec"]))
    got2 = audio_fingerprint_matches_incremental(
        fp_new, fp_ref2, max_bucket=2).collect()
    assert ("b", "a") in {(r.id_a, r.id_b) for r in got2}


def test_ann_ivfpq_null_embeddings_dropped(spark):
    """NULL embedding rows must not crash the IVF-PQ Arrow kernels and must
    not change the results for the non-NULL corpus (they are dropped up
    front — a NULL vector can be neither searched nor matched)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from heliport_spark.operators.similarity import ivfpq_ann_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    base = sorted(map(tuple, ivfpq_ann_topk(e, q, k=3, n_probe=4).collect()))
    nulls = spark.createDataFrame(
        [(10_000_001, None), (10_000_002, None)],
        StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]),
    )
    e2 = e.select("vec_id", "embedding").unionByName(nulls)
    q2 = e2.filter((F.col("vec_id") < 10) | (F.col("vec_id") > 10_000_000))
    with_nulls = sorted(map(tuple, ivfpq_ann_topk(e2, q2, k=3,
                                                  n_probe=4).collect()))
    assert with_nulls == base
