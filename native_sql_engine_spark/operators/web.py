"""Web-crawl preprocessing operators — HTML→text, URL normalization.

The front half of every crawl-derived LLM corpus (CommonCrawl-style):
strip markup to prose, canonicalize URLs for dedup/filtering.  All pure
DataFrame column expressions — JVM-side, codegen'd, zero Python in the
hot path — so they pipeline into the scan at 100 TB like any other
projection.  Regex patterns deliberately stay in the common subset of
Java regex (Spark) and RE2 (DuckDB oracle): inline (?is) flags,
non-greedy quantifiers, character classes — NO backreferences.

WARC container parsing lives in operators/warc.py (framed binary, not a
column expression).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_to_text", "url_domain", "url_normalize"]

#: (pattern, replacement) pipeline for markup stripping.  Order matters:
#: script/style bodies go first (their content is not prose), then
#: comments, then remaining tags.
_STRIP_PATTERNS = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)

#: minimal HTML entity set (the ones templating engines actually emit).
#: &amp; is decoded LAST so '&amp;lt;' becomes '&lt;' (one level), never '<'.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Markup-stripped prose from an HTML column: remove script/style
    bodies, comments and tags; decode the common entities; collapse
    whitespace.  One codegen'd projection — the whole chain fuses into
    WholeStageCodegen with the scan."""
    out = col
    for pat, rep in _STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def url_domain(col: Column) -> Column:
    """Registered host of a URL (lowercased, userinfo and port dropped).
    Pure regex — portable to the DuckDB oracle, unlike parse_url."""
    return F.lower(
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )


def url_normalize(col: Column) -> Column:
    """Canonical URL for crawl dedup: lowercase scheme+host, drop the
    fragment, drop default ports (:80 http / :443 https), strip tracking
    parameters (utm_*, fbclid, gclid, ref), and tidy leftover ?/&
    separators.  Expression-only; at 100 TB this runs inside the scan
    projection, and the canonical string is what the exact-dedup digest
    keys on."""
    # lowercase scheme://host[:port] (group 1), keep the rest (group 2) as-is
    lowered = F.concat(
        F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)", 1)),
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*(.*)$", 1),
    )
    out = F.regexp_replace(lowered, r"#.*$", "")  # fragment
    out = F.regexp_replace(out, r"^(https://[^/:?#]+):443(?=[/?]|$)", r"$1")
    out = F.regexp_replace(out, r"^(http://[^/:?#]+):80(?=[/?]|$)", r"$1")
    # tracking params: '&'-joined ones vanish outright; one directly after
    # '?' hands its '?' to the next param (or drops with it at end-of-URL)
    tracked = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*"
    out = F.regexp_replace(out, "&" + tracked, "")
    out = F.regexp_replace(out, r"\?" + tracked + "&", "?")
    return F.regexp_replace(out, r"\?" + tracked + "$", "")
