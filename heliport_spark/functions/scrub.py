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

# Ordered: URLs before handles (URLs may contain '@'), emails before handles.
SCRUB_PATTERNS: "tuple[tuple[str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("url", r"(https?://|www\.)[^\s]+"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{6,}[0-9]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("handle", r"@[A-Za-z0-9_]{2,}"),
)

# Demo toxicity lexicon (placeholder wordlist; swap for a production list).
TOXICITY_WORDS: "tuple[str, ...]" = ("badword", "slurword", "expletive")
TOXICITY_PATTERN = r"(?i)\b(" + "|".join(TOXICITY_WORDS) + r")\b"

ALL_PATTERNS: "tuple[tuple[str, str], ...]" = SCRUB_PATTERNS + (
    ("toxicity", TOXICITY_PATTERN),
)


# One-alternation trigger: fires iff ANY pattern matches the original text.
# If nothing matches, the sequential chain is the identity (replacements only
# happen on matches, and later patterns see unmodified text), so clean rows —
# the vast majority at web scale — pay ONE early-exit rlike pass instead of
# 12 full regexp_count/regexp_replace passes. The (?i) stays scoped to the
# toxicity branch (inline flags end at the enclosing group in Java regex).
_TRIGGER = "(" + ")|(".join(pat for _name, pat in ALL_PATTERNS) + ")"


def scrub_expr(col: "Column | str") -> "tuple[Column, Column]":
    """→ (scrubbed_text, scrub_spans) as Catalyst columns."""
    c0 = F.col(col) if isinstance(col, str) else col
    c = c0
    spans = F.lit(0)
    for _name, pat in ALL_PATTERNS:
        spans = spans + F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, SCRUB_TOKEN)
    dirty = c0.rlike(_TRIGGER)
    return (
        F.when(dirty, c).otherwise(c0),
        # NULL text → NULL spans (matching the DuckDB oracle and the plain
        # regexp_count chain, which both propagate NULL); the early-exit
        # otherwise(0) only applies to genuinely clean non-NULL rows
        F.when(c0.isNull(), F.lit(None).cast("int"))
        .when(dirty, spans.cast("int"))
        .otherwise(F.lit(0)),
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
