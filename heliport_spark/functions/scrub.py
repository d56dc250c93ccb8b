"""PII / toxicity regex scrubbing — pure Catalyst expression chain (D6).

Runs entirely JVM-side (``regexp_replace`` / ``regexp_count``), inside
whole-stage codegen — no Python in the hot path. Patterns are written in the
RE2-compatible subset (no backreferences/lookaheads) so the DuckDB oracle in
``__spark_entry__.py`` can execute the *same* pattern strings.

Span accounting matches a sequential scrubber: pattern i is counted on the
text as it exists after patterns 0..i-1 were applied, then replaced.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCRUB_TOKEN = "[SCRUBBED]"

# Ordered specific-before-general: URLs before handles (URLs may contain
# '@'), emails before handles, and ssn BEFORE phone — the phone pattern
# matches every SSN shape (digits+hyphens are all in its middle class), so
# the other order makes ssn dead code and misattributes every SSN to
# 'phone' in any per-category accounting. NOTE: the order is load-bearing
# for OUTPUT too, not just attribution — e.g. '12345678 123-45-6789' scrubs
# as two spans ssn-first but ONE phone span phone-first (the phone class
# eats spaces/hyphens across both) — reordering changes scrubbed_text and
# span counts and would break oracle parity.
SCRUB_PATTERNS: "tuple[tuple[str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("url", r"(https?://|www\.)[^\s]+"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{6,}[0-9]"),
    ("handle", r"@[A-Za-z0-9_]{2,}"),
)

# Demo toxicity lexicon (placeholder wordlist; swap for a production list).
TOXICITY_WORDS: "tuple[str, ...]" = ("badword", "slurword", "expletive")
TOXICITY_PATTERN = r"(?i)\b(" + "|".join(TOXICITY_WORDS) + r")\b"

ALL_PATTERNS: "tuple[tuple[str, str], ...]" = SCRUB_PATTERNS + (
    ("toxicity", TOXICITY_PATTERN),
)


def scrub_gate(c0: Column) -> Column:
    """Early-exit gate: TRUE for every row ANY pattern matches, possibly
    also for some clean rows — an OVER-approximation is harmless because the
    replacement chain is the identity and every count is 0 on a non-matching
    row, so gate false-positives produce identical output, just slower.
    Recall is exact by construction: email/handle require '@', url requires
    the literal 'http' or 'www.', and phone/ssn/toxicity gate on their own
    pattern. Measured 2.3× cheaper than the previous 12-alternation
    mega-regex on the 800k-clip bench (literal ``contains`` short-circuits
    most rows before any regex runs)."""
    return (
        c0.contains("@")
        | c0.contains("http")
        | c0.contains("www.")
        | c0.rlike(dict(SCRUB_PATTERNS)["phone"])
        | c0.rlike(dict(SCRUB_PATTERNS)["ssn"])
        | c0.rlike(TOXICITY_PATTERN)
    )


def _chain(c0: Column) -> "tuple[Column, Column]":
    """The sequential scrub chain: pattern i counted on the text as it
    exists after patterns 0..i-1, then replaced.

    Codegen note: with BOTH chain columns in one whole-stage-codegen'd
    projection the generated method exceeds HotSpot's 8,000-byte JIT limit
    and the whole stage ran interpreted (2.17 s for a gated-clean scrub
    pass at sf1.0 vs 0.84 s per column alone) — fixed globally by
    ``spark.sql.codegen.hugeMethodLimit`` in plans.get_spark, which falls
    back to per-operator codegen for oversized stages."""
    c = c0
    spans = F.lit(0)
    for _name, pat in ALL_PATTERNS:
        spans = spans + F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, SCRUB_TOKEN)
    return c, spans


def scrub_expr(col: "Column | str") -> "tuple[Column, Column]":
    """→ (scrubbed_text, scrub_spans) as Catalyst columns.

    The gate appears inline in BOTH output columns here; when both columns
    land in one projection, prefer :func:`scrub_apply`, which materializes
    the gate once (measured 5× on clean-heavy data)."""
    c0 = F.col(col) if isinstance(col, str) else col
    c, spans = _chain(c0)
    dirty = scrub_gate(c0)
    return (
        F.when(dirty, c).otherwise(c0),
        # NULL text → NULL spans (matching the DuckDB oracle and the plain
        # regexp_count chain, which both propagate NULL); the early-exit
        # otherwise(0) only applies to genuinely clean non-NULL rows
        F.when(c0.isNull(), F.lit(None).cast("int"))
        .when(dirty, spans.cast("int"))
        .otherwise(F.lit(0)),
    )


def scrub_apply(df, col: str, text_out: str = "scrubbed_text",
                spans_out: str = "scrub_spans",
                gate_extra: "Column | None" = None):
    """Hot-path form: add (scrubbed, spans) columns with the gate evaluated
    ONCE per row. The gate goes into its own projection; because it is a
    non-cheap expression referenced twice downstream, CollapseProject keeps
    that projection instead of inlining the gate into both output columns
    (which is what happens to the inline `scrub_expr` twins — measured 2×
    the gate cost there). Both projections stay in one whole-stage-codegen
    span, so this costs no extra pass over the data.

    ``gate_extra`` optionally replaces the gate's three rlike probes
    (phone/ssn/toxicity) with a precomputed candidate column (textstats.py's
    vectorized over-approximation with exact recall): the gate becomes the
    three cheap ``contains`` literals OR the candidate. Any over-
    approximation of "some pattern matches" yields identical output — the
    replacement chain is the identity and every count is 0 on a clean row
    (see scrub_gate) — while clean rows skip all three regex scans."""
    c0 = F.col(col)
    c, spans = _chain(c0)
    tmp = "__scrub_dirty"
    dirty = F.col(tmp)
    if gate_extra is not None:
        gate = (
            c0.contains("@") | c0.contains("http") | c0.contains("www.")
            | gate_extra
        )
    else:
        gate = scrub_gate(c0)
    return (
        df.withColumn(tmp, gate)
        .withColumn(text_out, F.when(dirty, c).otherwise(c0))
        .withColumn(
            spans_out,
            F.when(c0.isNull(), F.lit(None).cast("int"))
            .when(dirty, spans.cast("int"))
            .otherwise(F.lit(0)),
        )
        .drop(tmp)
    )


def scrub_sql(col: str) -> "tuple[str, str]":
    """The same chain as ANSI-ish SQL snippets for the DuckDB oracle.

    DuckDB needs the 'g' flag on regexp_replace (replace-all); counting uses
    ``len(regexp_extract_all(...))``.
    """
    text = col
    spans_terms = []
    for _name, pat in ALL_PATTERNS:
        p = pat.replace("'", "''")
        spans_terms.append(f"len(regexp_extract_all({text}, '{p}'))")
        text = f"regexp_replace({text}, '{p}', '{SCRUB_TOKEN}', 'g')"
    return text, "(" + " + ".join(spans_terms) + ")"
