"""CLI mirroring the reference's subcommands (/root/reference/src/cli/mod.rs):

  identify      lines in → ``lang`` or ``lang\\tscore`` out
                (heliport identify, src/cli/identify.rs:18-72)
  compile-model text models → numpy artifact (heliport binarize,
                src/cli/binarize.rs)
  create-model  corpus file(s) → top-k n-gram count files (heliport
                create-model, src/cli/create_models.rs) — Spark job
  pipeline      clips parquet → quality-filter decisions parquet (ours)

``identify`` runs driver-side (no Spark) for small inputs — the same
vectorized scorer the executors use — matching the reference CLI's output
format for golden-file parity.
"""

from __future__ import annotations

import argparse
import sys


_MP_SCORER = None


def _mp_init(model_dir, langs, strict_confidence=True):
    """Pool-worker initializer: each process opens the same mmap'd model
    (page-cache shared across processes — resident cost is one copy/host)."""
    global _MP_SCORER
    from .heli import Scorer
    from .model import get_model

    _MP_SCORER = Scorer(
        get_model(model_dir, langs=langs, strict_confidence=strict_confidence)
    )


def _mp_identify(payload):
    batch, ignore_confidence = payload
    labels, scores, _, _ = _MP_SCORER.identify_batch(batch, ignore_confidence)
    return [str(x) for x in labels], [float(s) for s in scores]


def cmd_identify(args) -> int:
    """Reference-CLI-parity identify, with ``-j`` multiprocess batches
    (the Spark-free twin of par_identify; reference ``-j`` threads arg,
    /root/reference/src/cli/identify.rs:20-33). Output is byte-identical to
    the single-process path: batches are dispatched in order and results
    written back in submission order (imap, not imap_unordered)."""
    from .heli import Scorer
    from .model import DEFAULT_MODEL_DIR, get_model

    model_dir = args.model_dir or DEFAULT_MODEL_DIR
    langs = args.relevant_langs.split(",") if args.relevant_langs else None
    jobs = max(1, args.threads)
    try:
        # load in the parent either way: -j workers fork and inherit the
        # mmap'd model (zero per-worker load), and bad model dirs / lang
        # codes fail fast here instead of inside pool initializers
        model = get_model(model_dir, langs=langs,
                          strict_confidence=not args.not_strict)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: could not load model: {e}", file=sys.stderr)
        return 1
    scorer = Scorer(model) if jobs == 1 else None
    try:
        fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    except OSError as e:
        print(f"error: opening input file: {e}", file=sys.stderr)
        return 1
    try:
        fout = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    except OSError as e:
        print(f"error: opening output file: {e}", file=sys.stderr)
        return 1

    def write_results(labels, scores):
        for lang, score in zip(labels, scores):
            if args.print_scores:
                fout.write(f"{lang}\t{score:.{args.precision}f}\n")
            else:
                fout.write(f"{lang}\n")

    def batches():
        batch: list[str] = []
        for line in fin:
            # \r too: the reference's BufRead::lines() strips CRLF, so a
            # CRLF input file must score the same strings (a trailing \r
            # would perturb every line-final n-gram)
            batch.append(line.rstrip("\r\n"))
            if len(batch) >= args.batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    try:
        if jobs == 1:
            for batch in batches():
                labels, scores, _, _ = scorer.identify_batch(
                    batch, args.ignore_confidence
                )
                write_results(labels, scores)
        else:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            with ctx.Pool(
                jobs, initializer=_mp_init,
                initargs=(str(model_dir), langs, not args.not_strict),
            ) as pool:
                work = ((b, args.ignore_confidence) for b in batches())
                for labels, scores in pool.imap(_mp_identify, work, chunksize=1):
                    write_results(labels, scores)
    finally:
        if args.input:
            fin.close()
        if args.output:
            fout.close()
    return 0


def cmd_compile_model(args) -> int:
    """Reference ``binarize`` semantics (/root/reference/src/cli/binarize.rs:
    13-29): refuse to overwrite an existing artifact unless ``-f/--force``."""
    import os

    from .model import DEFAULT_MODEL_DIR
    from .model_compile import compile_model

    out_dir = args.out or str(DEFAULT_MODEL_DIR)
    if not args.force and os.path.exists(os.path.join(out_dir, "meta.json")):
        print(
            f"error: model artifact already exists at {out_dir}, "
            "use -f/--force to overwrite",
            file=sys.stderr,
        )
        return 1
    out = compile_model(
        args.src, out_dir, args.langs.split(",") if args.langs else None,
        strict_confidence=not args.not_strict,
    )
    if not getattr(args, "quiet", False):
        print(f"compiled model artifact at {out}", file=sys.stderr)
    return 0


def cmd_create_model(args) -> int:
    """Train n-gram count files from line corpora (T1-T4) with Spark."""
    import os

    from pyspark.sql import functions as F

    from .operators.train import (
        char_ngrams_expr,
        nonalpha_scrub_udf,
        top_k,
        words_expr,
    )
    from .plans import get_spark

    spark = get_spark(app_name="heliport_create_model")
    os.makedirs(args.output_dir, exist_ok=True)
    scrub = nonalpha_scrub_udf()
    order_names = ("word", "unigram", "bigram", "trigram", "quadgram",
                   "quingram", "hexagram")
    for path in args.input_files:
        lang = os.path.basename(path).split(".")[0]
        # trainer parity (trainer.rs:33): non-alpha → space BEFORE tokenizing
        lines = spark.read.text(path).select(
            scrub(F.col("value")).alias("value")
        )
        # 7 gram orders scan the same tokens; cache so the scrub UDF runs once
        words = lines.select(
            F.explode(words_expr(F.col("value"))).alias("w")
        ).persist()
        for t, oname in enumerate(order_names):
            if t == 0:
                grams = words.select(F.col("w").alias("gram"))
            else:
                grams = words.select(
                    F.explode(char_ngrams_expr(F.col("w"), t)).alias("gram")
                )
            counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
            # persist: top-k and the total are TWO actions over the same
            # explode+aggregate — without the cache the dominant stage of
            # training runs twice per order
            counts = counts.persist()
            top = top_k(counts, args.top_k).orderBy(F.desc("cnt"), F.asc("gram"))
            rows = top.collect()
            total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
            counts.unpersist()
            with open(
                os.path.join(args.output_dir, f"{lang}.{oname}.model"),
                "w", encoding="utf-8",
            ) as fh:
                fh.write(f"{total}\n")
                for r in rows:
                    fh.write(f"{r['gram']}\t{r['cnt']}\n")
        words.unpersist()
        if not getattr(args, "quiet", False):
            print(f"trained '{lang}'", file=sys.stderr)
    return 0


def cmd_pipeline(args) -> int:
    from .pipeline import run_pipeline
    from .plans import get_spark

    spark = get_spark(app_name="heliport_pipeline")
    clips = spark.read.parquet(args.input)
    counters = run_pipeline(
        spark, clips, args.output, n_buckets=args.buckets,
        model_dir=args.model_dir, resume=not args.no_resume,
        with_signal_gate=args.signal_gate, with_denoise=args.denoise,
        with_classifier=args.classifier,
    )
    print(counters)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="heliport_spark")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="suppress informational messages (reference global "
                         "-q, src/cli/mod.rs:52-57: info -> error verbosity)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("identify", aliases=["detect"])
    p.add_argument("-b", "--batch-size", type=int, default=100_000)
    p.add_argument("-j", "--threads", type=int, default=1,
                   help="worker processes for identify (reference -j, "
                        "src/cli/identify.rs:20-33); 1 = in-process")
    p.add_argument("-c", "--ignore-confidence", action="store_true")
    p.add_argument("-n", "--not-strict", action="store_true",
                   help="do not fail when a confidenceThresholds override "
                        "file is missing a language (reference identify -n, "
                        "src/cli/identify.rs:47-51); missing langs get "
                        "threshold 0")
    p.add_argument("-s", "--print-scores", action="store_true")
    p.add_argument("-p", "--precision", type=int, default=4)
    p.add_argument("-m", "--model-dir", default=None)
    p.add_argument("-l", "--relevant-langs", default=None,
                   help="comma-separated language subset (reference T8)")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("output", nargs="?", default=None)
    p.set_defaults(fn=cmd_identify)

    p = sub.add_parser("compile-model")
    p.add_argument("--src", default="/root/reference/LanguageModels")
    p.add_argument("--out", default=None)
    p.add_argument("--langs", default=None)
    p.add_argument("-f", "--force", action="store_true",
                   help="overwrite an existing artifact (reference binarize -f)")
    p.add_argument("-s", "--not-strict", action="store_true",
                   help="do not fail when confidenceThresholds is missing a "
                        "language (reference binarize -s, "
                        "src/cli/binarize.rs:25-28)")
    p.set_defaults(fn=cmd_compile_model)

    p = sub.add_parser("create-model", aliases=["create-models"])
    p.add_argument("output_dir")
    p.add_argument("input_files", nargs="+")
    p.add_argument("-k", "--top-k", type=int, default=10_000)
    p.set_defaults(fn=cmd_create_model)

    p = sub.add_parser("pipeline")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--signal-gate", action="store_true",
                   help="also decode PCM of transcript-gate survivors and "
                        "AND silence/clipping/drift flags into keep "
                        "(functions/audio.py)")
    p.add_argument("--denoise", action="store_true",
                   help="append bytes_dn/noise_db (spectral-subtraction "
                        "denoise) for keep-survivors as the last stage; "
                        "dropped rows emit NULL and skip the FFT")
    p.add_argument("--classifier", action="store_true",
                   help="score transcripts with the trained quality "
                        "classifier (quality_train.py) and fold the "
                        "low_quality_classifier DROP rule into keep; "
                        "qc_score stays as a diagnostic column")
    p.set_defaults(fn=cmd_pipeline)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
