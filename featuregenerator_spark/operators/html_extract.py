"""HTML main-content extraction — the stage BEFORE the C4 line filter
in a web-corpus pipeline.

Raw web corpora (Common Crawl WET-adjacent processing, C4, RefinedWeb)
start from markup; everything downstream (line filters, quality rules,
dedup) assumes plain text. This module is the deterministic rule-based
extractor:

1. remove ``<script>``/``<style>`` blocks and HTML comments WHOLESALE
   (their text content is never corpus text);
2. turn block-level closers (``</p> </div> </li> </h1..6> </tr>
   </table> </ul> </ol>``) and ``<br>`` into newlines, so block
   structure survives as line structure for the C4 stage;
3. strip every remaining tag;
4. decode the 6 ubiquitous entities (``&lt; &gt; &quot; &#39; &nbsp;
   &amp;`` — amp LAST, the standard order that keeps ``&amp;lt;`` a
   literal ``&lt;``); decoding AFTER tag-stripping means
   entity-encoded angle brackets can never be eaten as tags;
5. trim each line and drop empties.

Plain text without markup passes through unchanged (idempotence), so
the stage is safe to run unconditionally.

Everything is a chain of regexp/replace Column expressions inside one
whole-stage-codegen pass — no Python, no shuffle, runs at scan speed
like the rest of the curation battery (text_clean.py). Patterns avoid
lookaround/backreferences so the Java (Spark) and RE2 (DuckDB)
dialects agree, and the DuckDB oracle runs the identical chain.

The reference has no extraction operator (fg_lite consumes structured
features, not web text); this completes the curation battery's front
end alongside url_filter.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# wholesale-removal blocks: content is never text
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"
# block-structure boundaries become newlines
BLOCK_RE = r"(?i)</(?:p|div|li|h[1-6]|ul|ol|tr|table)>|<br[^>]*>"
TAG_RE = r"(?s)<[^>]*>"

# (entity, replacement) — decode order matters: &amp; strictly last
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_text_columns(html: Column) -> dict[str, Column]:
    """Extraction as named Columns: the extracted text (newline-joined
    trimmed non-empty lines), the line count, and the number of tags
    stripped (audit metric — a near-zero tag count on a 'web' source
    flags an upstream extraction already applied)."""
    t = F.regexp_replace(html, SCRIPT_RE, "")
    t = F.regexp_replace(t, STYLE_RE, "")
    t = F.regexp_replace(t, COMMENT_RE, "")
    n_tags = F.regexp_count(t, F.lit(TAG_RE)) + F.regexp_count(
        html, F.lit(SCRIPT_RE)
    ) + F.regexp_count(html, F.lit(STYLE_RE)) + F.regexp_count(
        html, F.lit(COMMENT_RE)
    )
    t = F.regexp_replace(t, BLOCK_RE, "\n")
    t = F.regexp_replace(t, TAG_RE, "")
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    lines = F.filter(
        F.transform(
            F.split(t, "\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
        ),
        lambda l: l != "",
    )
    return {
        "extracted": F.array_join(lines, "\n"),
        "n_lines": F.size(lines).cast("long"),
        "n_tags": n_tags.cast("long"),
    }


def with_html_extract(df: DataFrame, html_col: str = "html") -> DataFrame:
    cols = html_text_columns(F.col(html_col))
    return df.select("*", *[c.alias(n) for n, c in cols.items()])
