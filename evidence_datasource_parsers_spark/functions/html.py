"""HTML → text extraction for crawl ingestion.

The step before every text operator in a web-crawl pipeline: strip markup,
drop script/style/comment payloads, decode the common entities, collapse
whitespace.  Pure native regexp expressions — per-row, no UDF, no shuffle —
deliberately the conservative 95% of what a boilerplate extractor does;
full DOM-aware readability extraction belongs in a mapInPandas tier with a
real parser (same operator shape as the multimodal decoders).

Order matters and is load-bearing:
  1. remove <script>/<style>/<!-- --> WITH their contents (their text is
     code, not prose — tag-stripping alone would leak it into the corpus);
  2. block-level tags → newline, remaining tags → space (so "<p>a</p><p>b"
     doesn't fuse words);
  3. entity decode AFTER tag removal (decoding first would turn
     ``&lt;script&gt;`` into a live tag and re-open step 1's hole);
  4. whitespace collapse last.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?is) = case-insensitive + dotall; non-greedy bodies
_DROP_BLOCKS = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->"
_BLOCK_TAGS = (
    r"(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote|pre|"
    r"section|article|header|footer|nav)\b[^>]*>"
)
_ANY_TAG = r"<[^>]+>"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # LAST: else &amp;lt; would double-decode
]


def strip_html(text: Column | str) -> Column:
    """Visible text of an HTML fragment (module doc for the exact policy).
    NULL in → NULL out; entity-free plain text passes through (modulo
    whitespace collapsing).

    NOT idempotent on entity-bearing input — the double-unescape hazard:
    ``&lt;b&gt;`` decodes to a literal ``<b>`` which a SECOND pass would
    strip as a tag.  Run the stage exactly once per document (route with
    :func:`looks_like_html`); re-running is safe only for text that
    contained no encoded markup."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, _DROP_BLOCKS, " ")
    out = F.regexp_replace(out, _BLOCK_TAGS, "\n")
    out = F.regexp_replace(out, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n[ \n]*", "\n")
    # Spark's trim() strips spaces only — newlines need the regexp form
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def looks_like_html(text: Column | str) -> Column:
    """Cheap router predicate: does this document need :func:`strip_html`?
    True when a real tag pair or doctype appears — routing plain text around
    the regexp chain keeps the common path narrow."""
    c = F.col(text) if isinstance(text, str) else text
    return c.rlike(r"(?is)<!doctype\s+html|<[a-zA-Z][^>]*>.*</[a-zA-Z]")


def extract_links(text: Column | str) -> Column:
    """array<string> of href targets from anchor tags — the input to the
    link graph (operators/pagerank.domain_authority).

    Native regexp_extract_all over ``<a ... href="...">`` (single or
    double quotes, case-insensitive, whitespace-tolerant); relative,
    fragment-only, and javascript: links are filtered out — they carry no
    cross-domain signal.  Run this on the RAW html (before strip_html —
    stripping removes the tags links live in).
    """
    col = F.col(text) if isinstance(text, str) else text
    pat = r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"']+)["']"""
    links = F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(pat), 1)
    return F.filter(
        links,
        lambda u: u.rlike("(?i)^https?://"),
    )
