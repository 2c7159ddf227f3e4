"""Document cleaning: C4-style boilerplate line filtering + PII scrubbing.

The other standard pre-training curation stage next to the Gopher rule
battery (``quality_rules.py``): C4 (Raffel et al. 2020, public paper)
cleans documents LINE-wise — keep only lines that end in terminal
punctuation, have at least a minimum word count, and contain no
blocklisted boilerplate phrase; drop the whole document if it shrank too
far. PII scrubbing replaces emails / phone numbers / IPv4 addresses
with typed placeholder tokens and reports per-kind counts (the counts
feed audit metrics; the rewritten text feeds the tokenizer).

Both are pure Column expressions — string/array higher-order functions
inside whole-stage codegen, no Python, no shuffle — so they run at scan
speed and have exact DuckDB oracles. The regexes avoid lookaround and
backreferences so the Java (Spark) and RE2 (DuckDB) dialects match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- C4 line rules (paper defaults) ---------------------------------------
C4_MIN_LINE_WORDS = 3
C4_TERMINAL_PUNCT = r'[.!?"]\s*$'
C4_BLOCKLIST = ("lorem ipsum", "javascript", "{", "cookie policy")
C4_MIN_KEPT_LINES = 3  # doc survives only if >= 3 lines remain


def _line_ok(line: Column) -> Column:
    words = F.filter(F.split(line, r"\s+"), lambda w: w != "")
    has_punct = line.rlike(C4_TERMINAL_PUNCT)
    lowered = F.lower(line)
    blocked = F.lit(False)
    for phrase in C4_BLOCKLIST:
        blocked = blocked | lowered.contains(phrase)
    return (F.size(words) >= C4_MIN_LINE_WORDS) & has_punct & ~blocked


def c4_clean_columns(text: Column) -> dict[str, Column]:
    """C4 line filter as named Columns: kept-line text (newline-joined),
    kept/dropped counts, and the document-level keep flag."""
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    kept = F.filter(lines, _line_ok)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_dropped_lines": (F.size(lines) - F.size(kept)).cast("long"),
        "clean_text": F.array_join(kept, "\n"),
        "keep_doc": (F.size(kept) >= C4_MIN_KEPT_LINES),
    }


def with_c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = c4_clean_columns(F.col(text_col))
    return df.select("*", *[c.alias(n) for n, c in cols.items()])


# --- PII scrubbing ---------------------------------------------------------
# Lookaround-free patterns that parse identically under Java and RE2.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# international-ish phone: optional +CC then 3 groups of 3-4 digits
# separated by spaces or dashes (anchored on word boundaries)
PII_PHONE = r"\+?[0-9]{1,3}[ \-][0-9]{3}[ \-][0-9]{3}[ \-]?[0-9]{0,4}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PII_ORDER = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("ip", PII_IPV4, "<IP>"),
    ("phone", PII_PHONE, "<PHONE>"),
)


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def pii_scrub_columns(text: Column) -> dict[str, Column]:
    """Scrub emails, IPv4 addresses, then phone numbers (in that fixed
    order — email local parts may contain digits a phone pattern would
    otherwise bite into) and count each kind. Counting happens BEFORE
    any replacement so the metrics describe the original text."""
    counts = {
        f"n_{name}": _count_matches(text, pat) for name, pat, _ in _PII_ORDER
    }
    scrubbed = text
    for _, pat, token in _PII_ORDER:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return {**counts, "scrubbed_text": scrubbed}


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = pii_scrub_columns(F.col(text_col))
    return df.select("*", *[c.alias(n) for n, c in cols.items()])


def normalize_text_columns(text):
    """Canonicalization before hashing/dedup (every exact-dup pass is
    only as good as its normalization): lowercase, strip control chars,
    collapse whitespace runs to single spaces, trim. Returns the metric
    dict shape the other curation ops use. Lookaround-free patterns
    with explicit char classes keep Java (Spark) and RE2 (DuckDB)
    agreeing. Counters come from length deltas — no second regex scan
    of the text."""
    from pyspark.sql import functions as F

    no_ctrl = F.regexp_replace(text, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    collapsed = F.trim(
        F.regexp_replace(no_ctrl, "[ \\t\\n\\r]+", " ")
    )
    norm = F.lower(collapsed)
    return {
        "n_ctrl_removed": (F.length(text) - F.length(no_ctrl)).cast("long"),
        "n_ws_collapsed": (
            F.length(no_ctrl) - F.length(collapsed)
        ).cast("long"),
        "norm_text": norm,
        "changed": (norm != text).cast("int"),
    }
