"""Synthetic ``clips`` table generation (FIXTURES.md F1) + golden corpus rows.

Deterministic (seed derived from row id, no wall clock): audio is
``0.3·sin(2π·440·t) + 0.05·noise`` quantized to PCM s16le, so decode →
re-encode is bit-exact and the SNR≥30dB passthrough assertion is meaningful.

Schema (BASELINE.json input_hint):
  clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
        codec string, transcript string)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
    ]
)

# The reference's 13-sentence golden corpus (identifier.rs:384-398) with its
# expected HeLI predictions (identifier.rs:400-414) — used to salt synthetic
# clips with rows whose labels are known exactly.
GOLDEN_SENTS: "tuple[str, ...]" = (
    "L'aigua clara",
    "Hola, ¿qué tal?",
    "Korvausinvestoinnit on otettu huomioon liiketoimintasuunnitelmassa rahoituskuluina ja poistoina.",
    "而目前各方都在追问到底谁应该为这场大疫情在中国的扩散承担责任。",
    "Pēc nejaušās izvēles izraudzītas sešas vistas no vielas saņemšanas grupas un sešas vistas no nesēja kontroles grupas, un trīs vistas no pozitīvās kontroles grupas (ja šo grupu pēta paralēli) jānogalina dažas dienas pēc dozēšanas, un galvas smadzenes un muguras smadzenes jāsagatavo un jāanalizē, lai noteiktu ar neiropātiju saistītās esterāzes kavēšanas aktivitāti.",
    "وتؤكد رومانيا على التزامها بمواصلة تنفيذ أحكام جدول أعمال الموئل والمشاركة في التعاون الدولي في هذا المجال الدينامي ، وبالتالي زيادة الاستفادة من الدعم والمساعدة المقدمة في تنفيذ برامجها الوطنية.",
    'Namoota duʼaa kaafaman keessaa hedduun isaanii "jalʼoota," jechuunis namoota dhugaa waaʼee Waaqa keenya Yihowaa fi Ilma isaa dubbatu utuu hin baratin duʼani dha.',
    "DOKUMENT INFORMACYJNY NR [...]",
    "In afwijking van de verplichting van sectie IX, hoofdstuk II, punt III.1.a), van bijlage III van Verordening (EG) nr. 853 / 2004 is het maximale kiemgetal voor rauwe koemelk slechts van toepassing indien deze melk warmtebehandeld moet worden en niet zodanig behandeld is binnen de termijn voor aanvaarding die bepaald is in de door de exploitanten van levensmiddelenbedrijven ingevoerde, op HACCP gebaseerde procedures.",
    "Batangiye gushyiraho imihati myinshi no kumara igihe kinini bakurikirana inyungu z'iby'umwuka, ari na ko bakora uko bashoboye ngo begere Yehova.",
    'The Encyclopedia of Religion gir flere opplysninger: "Dens visjon av en menneskehet som hadde behov for Kristi evangelium, talte for igangsettelse og rask utvidelse av misjonsvirksomheten, både utenlands og innenlands."',
    "Kui lõike 5 alusel vastu võetud tehnilistest rakendusmeetmetest ei tulene teisiti, võivad pädevad riigiasutused võtta vastu suuniseid ja vajaduse korral anda juhiseid selle kohta, millistel asjaoludel peab teenuseosutaja teatama isikuandmetega seotud rikkumisest ning millises vormis ja mil viisil seda tuleb teha.",
    "મજાક તરીકે @K.",
)
GOLDEN_LABELS: "tuple[tuple[str, float], ...]" = (
    ("cat", 1.5613), ("spa", 0.2340), ("fin", 1.8580), ("cmn", 2.5705),
    ("lav", 2.2733), ("ara", 2.6973), ("gaz", 3.3978), ("pol", 0.3492),
    ("nld", 0.7148), ("tso", 0.2414), ("nob", 0.9093), ("est", 2.6729),
    ("und", 0.6115),
)

# Adversarial rows: scrub targets, empties, repetition, CJK mix.
ADVERSARIAL_SENTS: "tuple[str, ...]" = (
    "",
    "!!! ??? 123 ...",
    "contact me at john.doe@example.com or +1 (555) 123-4567 now",
    "visit https://example.com/signup?ref=abc and follow @john_doe",
    "my ssn is 123-45-6789 ok",
    "spam spam spam spam spam spam spam spam",
    "你好世界 hello 你好世界你好世界你好世界你好世界",
    "this badword sentence has a slurword in it",
)


def synth_pcm(row_id: int, sr_hz: int = 16000, dur_ms: "int | None" = None) -> bytes:
    """Deterministic PCM s16le for a row id (sine + noise, FIXTURES.md F1)."""
    rng = np.random.default_rng(42 + (row_id % (2**31)))
    if dur_ms is None:
        dur_ms = int(200 + (row_id * 37) % 800)
    from ..functions.audio import encode_pcm_s16le

    n = sr_hz * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / sr_hz
    wave = 0.3 * np.sin(2 * np.pi * 440.0 * t) + 0.05 * rng.standard_normal(n)
    return encode_pcm_s16le(wave.astype(np.float32))


def synth_pcm_varied(row_id: int, sr_hz: int = 16000,
                     dur_ms: "int | None" = None) -> bytes:
    """Deterministic PCM with a PER-ID spectral identity (fundamental + two
    harmonics + phase drawn from the id), so distinct clips are acoustically
    DISTINCT — the single-tone corpus of :func:`synth_pcm` is the degenerate
    case for acoustic embeddings/fingerprints (every clip lands at cosine≈1).
    Ids with ``row_id % 29 == 1`` reuse the PREVIOUS id's spectrum with
    fresh noise: planted audio near-duplicates whose transcripts differ —
    exactly what an audio-near-dup stage must catch (same recording
    re-uploaded under a new id with a re-run transcription)."""
    from ..functions.audio import encode_pcm_s16le

    base_id = row_id - 1 if row_id % 29 == 1 else row_id
    rng_w = np.random.default_rng(1_000 + (base_id % (2**31)))  # spectrum
    rng_n = np.random.default_rng(42 + (row_id % (2**31)))      # noise
    if dur_ms is None:
        dur_ms = int(200 + (row_id * 37) % 800)
    n = sr_hz * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / sr_hz
    # three INDEPENDENT random tones, not a harmonic stack: two distinct
    # ids collide acoustically only if all three frequencies coincide
    # (single-f0 identities collide at birthday rate over a few-hundred-clip
    # corpus and percolate the near-dup graph)
    freqs = rng_w.uniform(150.0, 3500.0, size=3)
    wave = np.zeros(n)
    for f, amp in zip(freqs, (0.3, 0.2, 0.12)):
        wave += amp * np.sin(2 * np.pi * float(f) * t
                             + rng_w.uniform(0.0, 6.28))
    wave += 0.03 * rng_n.standard_normal(n)
    return encode_pcm_s16le(wave.astype(np.float32))


def clips_from_documents(spark: SparkSession, sf_dir: str,
                         with_golden: bool = True,
                         replicate: int = 1,
                         max_pcm_ms: "int | None" = None,
                         audio_style: str = "tone",
                         with_bytes: bool = True) -> DataFrame:
    """Derive a deterministic clips table from the driver's ``documents``
    parquet: transcript = documents.text (+ the golden/adversarial corpus
    appended), PCM synthesized per row. Distributed via mapInPandas — no
    driver-side materialization.

    ``replicate`` > 1 produces N distinct-id copies of each document
    (benchmark scale-up); ``max_pcm_ms`` caps the synthesized audio length
    (dur_ms metadata stays consistent with the bytes); ``audio_style``
    picks the PCM recipe — "tone" (the F1 sine family) or "varied"
    (:func:`synth_pcm_varied`: per-id spectra + planted audio near-dups,
    for queries whose semantics need acoustically distinct clips).

    ``with_bytes=False`` skips the PCM synthesis and emits ``bytes`` NULL —
    for consumers that never read the audio payload (e.g. the transcript
    quality-filter queries). The synthesis lives inside an opaque
    ``mapInPandas``, so Catalyst cannot column-prune it away on its own
    (optimization guide §4.1): a caller that projects ``bytes`` out would
    still pay full waveform synthesis plus the Arrow transfer of the PCM
    (~20 GB at sf1.0) without this flag. ``dur_ms`` stays BIT-IDENTICAL to
    the with_bytes path: it is derived from the same integer sample-count
    arithmetic (n = sr*dur//1000; dur_ms = n*1000//sr) the encoder's byte
    length would produce."""
    if audio_style not in ("tone", "varied"):
        raise ValueError(f"unknown audio_style {audio_style!r}")
    synth_fn = synth_pcm_varied if audio_style == "varied" else synth_pcm
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if replicate > 1:
        # salt each replica's transcript with a distinct trailing token:
        # byte-identical copies would let the scorer's exact-duplicate
        # shortcut skip the scoring work the scale-up exists to measure
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
        )
    # Spread synth across cores (a single small parquet file = one input
    # split) and bound the PCM bytes per Arrow batch: a yielded pandas frame
    # becomes one Arrow record batch, and 10k rows × ~0.5 MB PCM would
    # overflow the 2 GiB single-array binary limit — so emit ≤128-row chunks.
    par = spark.sparkContext.defaultParallelism * 2
    docs = docs.repartition(par, "doc_id")

    def synth(batches):
        CHUNK = 128
        for pdf0 in batches:
            if len(pdf0) and int(pdf0["doc_id"].max()) >= 10_000_000:
                # golden rows start at 10M, signal-adversarial at 20M — a
                # corpus (or replicate factor) whose ids reach that range
                # would silently collide clip_ids with the fixture rows
                raise ValueError(
                    "doc_id >= 10,000,000 collides with the golden/"
                    "adversarial clip_id namespace; lower replicate or "
                    "re-key the corpus"
                )
            for lo in range(0, len(pdf0), CHUNK):
                pdf = pdf0.iloc[lo : lo + CHUNK]
                out = pd.DataFrame(
                    {
                        "clip_id": [f"clip-{int(d):012d}" for d in pdf["doc_id"]],
                        "transcript": pdf["text"].astype(object),
                    }
                )
                srs, bs, dms = [], [], []
                for d, txt in zip(pdf["doc_id"], pdf["text"]):
                    d = int(d)
                    # varied mode: a planted audio dup (d % 29 == 1) is the
                    # SAME RECORDING re-uploaded — it must share the base
                    # clip's sample rate, not roll its own
                    sid = d - 1 if (audio_style == "varied" and d % 29 == 1) else d
                    sr = 8000 if sid % 17 == 0 else (22050 if sid % 23 == 0 else 16000)
                    # duration tracks transcript length (~25 chars/s speech
                    # rate) so the rate rule only fires on deliberate outliers
                    nchars = len(txt) if isinstance(txt, str) else 0
                    dur = max(200, min(60_000, int(nchars * 1000 / 25)))
                    if d % 97 == 0:  # deliberate rate outliers
                        dur = 100_000 if d % 2 == 0 else 200
                    if max_pcm_ms is not None:
                        dur = min(dur, max_pcm_ms)
                    if with_bytes:
                        raw = synth_fn(d, sr, dur_ms=dur)
                        bs.append(raw)
                        n_samples = len(raw) // 2
                    else:
                        bs.append(None)
                        # same integer arithmetic as the encoder's length:
                        # synth emits exactly sr*dur//1000 s16 samples
                        n_samples = sr * dur // 1000
                    srs.append(sr)
                    dms.append(n_samples * 1000 // sr)
                out["bytes"] = bs
                out["sr_hz"] = np.asarray(srs, np.int32)
                out["dur_ms"] = np.asarray(dms, np.int32)
                out["codec"] = "pcm_s16le"
                yield out[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]]

    df = docs.mapInPandas(synth, schema=CLIPS_SCHEMA)
    if with_golden:
        extra = golden_clips(spark, start_id=10_000_000,
                             audio_style=audio_style)
        df = df.unionByName(extra)
    return df


def signal_adversarial_clips(spark: SparkSession,
                             start_id: int = 20_000_000) -> DataFrame:
    """Deterministic clips whose AUDIO (not transcript) is defective — the
    fixtures for the signal-level gate (functions/audio.py
    audio_signal_flags): digital silence, a full-scale clipped square wave,
    and metadata whose dur_ms disagrees with the decoded sample count."""
    from ..functions.audio import encode_pcm_s16le

    sr = 16000
    n = sr  # 1 s
    t = np.arange(n, dtype=np.float64) / sr
    tone = encode_pcm_s16le(
        (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    )
    silence = encode_pcm_s16le(np.zeros(n, dtype=np.float32))
    square = encode_pcm_s16le(
        np.where(np.sin(2 * np.pi * 440.0 * t) >= 0, 1.0, -1.0).astype(np.float32)
    )
    rows = [
        (f"clip-{start_id + 0:012d}", silence, sr, 1000, "pcm_s16le",
         "a clip whose audio is pure digital silence"),
        (f"clip-{start_id + 1:012d}", square, sr, 1000, "pcm_s16le",
         "a clip whose audio is a clipped full scale square wave"),
        (f"clip-{start_id + 2:012d}", tone, sr, 2000, "pcm_s16le",
         "a clip whose duration metadata drifted from its sample count"),
    ]
    return spark.createDataFrame(rows, schema=CLIPS_SCHEMA)


def make_clips(spark: SparkSession,
               rows: "list[tuple[str, str]]",
               pcm_seed_base: int = 0,
               audio_style: str = "tone") -> DataFrame:
    """Tiny ad-hoc clips table from (clip_id, transcript) pairs — the ONE
    copy of the duration/PCM synthesis recipe (golden_clips delegates
    here); ~15 chars/s duration keeps the rate-anomaly rule quiet.
    ``audio_style="varied"`` uses the per-id-spectrum recipe
    (:func:`synth_pcm_varied`) so the rows are acoustically distinct."""
    synth_fn = synth_pcm_varied if audio_style == "varied" else synth_pcm
    out = []
    for i, (cid, s) in enumerate(rows):
        dur = max(200, min(60_000, int(len(s) * 1000 / 15)))
        raw = synth_fn(pcm_seed_base + i, dur_ms=dur)
        out.append(
            (cid, raw, 16000, len(raw) // 2 * 1000 // 16000, "pcm_s16le", s)
        )
    return spark.createDataFrame(out, schema=CLIPS_SCHEMA)


def golden_clips(spark: SparkSession, start_id: int = 0,
                 audio_style: str = "tone") -> DataFrame:
    """Small driver-side DataFrame of the golden + adversarial corpus
    (row synthesis delegated to make_clips — one copy of the duration/PCM
    recipe)."""
    sents = list(GOLDEN_SENTS) + list(ADVERSARIAL_SENTS)
    return make_clips(
        spark,
        [(f"clip-{start_id + i:012d}", s) for i, s in enumerate(sents)],
        pcm_seed_base=start_id,
        audio_style=audio_style,
    )


def speechish_pcm(seed: int, sr_hz: int = 16000, secs: float = 4.0) -> np.ndarray:
    """Deterministic broadband 'syllable' audio (noise bursts + 3 modulated
    sines under a Hann envelope per burst). The fingerprint fixtures need
    wide, time-varying spectra: the corpus' 440 Hz tone family is the
    DEGENERATE case for constellation fingerprinting (every clip shares the
    same quantized FFT bin, i.e. the 'common hum' hot bucket)."""
    r = np.random.default_rng(seed)
    n = int(sr_hz * secs)
    w = np.zeros(n)
    pos = 0
    while pos < n:
        dur = int(sr_hz * r.uniform(0.05, 0.2))
        burst = r.standard_normal(dur)
        t = np.arange(dur)
        for _ in range(3):
            f = r.uniform(200, 3500)
            burst += 2.0 * np.sin(2 * np.pi * f * t / sr_hz + r.uniform(0, 6.28))
        seg = 0.2 * burst * np.hanning(dur)
        take = min(dur, n - pos)
        w[pos:pos + take] += seg[:take]
        pos += dur
    return np.clip(w, -1, 1)


def fingerprint_fixture_clips(spark: SparkSession,
                              start_id: int = 30_000_000,
                              n_background: int = 8) -> DataFrame:
    """Deterministic fixture for landmark fingerprint matching: clip 0 is a
    4 s broadband recording, clip 1 is its 2 s slice from 0.5 s with added
    noise (the planted partial overlap — expected offset 8000 samples =
    31 frames at the 256-sample hop), clips 2.. are unrelated broadband
    background. Ids live in the 30M namespace (golden=10M, adversarial=20M)."""
    from ..functions.audio import encode_pcm_s16le

    sr = 16000
    a = speechish_pcm(1)
    rng = np.random.default_rng(0)
    b = a[8000:8000 + 2 * sr] + 0.02 * rng.standard_normal(2 * sr)
    waves = [a, b] + [speechish_pcm(100 + i) for i in range(n_background)]
    rows = [
        (f"clip-{start_id + i:012d}", encode_pcm_s16le(w), sr,
         len(w) * 1000 // sr, "pcm_s16le",
         "broadband fingerprint fixture clip")
        for i, w in enumerate(waves)
    ]
    return spark.createDataFrame(rows, schema=CLIPS_SCHEMA)
