"""HTML/markup → text extraction (boilerplate removal) — SURVEY §2.13 EXT.

The FIRST stage of a web-corpus pipeline: C4 (Raffel et al. 2020 §2.2),
RefinedWeb and FineWeb all start from crawled markup, not clean text —
the engine's text stack previously began after extraction (r13 verdict,
missing #1). The reference has no such stage (its input is already clean
JSON-lines, ComputeWordScore.java:112-116); this operator is mandate-driven
(`BASELINE.json:6` "text analysis").

Three halves, all pure Column expressions (JVM regexp codegen, zero UDFs,
zero shuffles — the shape the most-executed scan of a 100 TB crawl needs):

- :func:`render_markup` — deterministic HTML wrapping of a clean text
  column. The container has no crawl, so the fixture is derived in-pipeline
  from the ``documents`` table (same pattern as multimodal's synthesized
  rasters) and BOTH engines can rebuild it byte-identically: the template
  constants below are interpolated into the registry oracle's DuckDB SQL,
  so Spark and the oracle render from one source of truth.
- :func:`strip_markup` — the extraction chain: drop <script>/<style>
  subtrees, turn block-tag boundaries into line breaks, strip remaining
  tags, decode the standard XML entities (unknown entities survive
  verbatim, as in real extractors), collapse horizontal whitespace.
  Regex-based extraction is the documented limitation it is everywhere
  (quoted ``>`` inside attribute values defeats ``<[^>]+>``); the C4/CCNet
  lineage accepts this trade for a scan-side, dependency-free hot path.
- :func:`c4_keep_line` — C4's line rules: terminal punctuation, a minimum
  word count, and a boilerplate-phrase blacklist (javascript/cookie/legal
  notices). Page-level rules (≥ N kept lines, no "lorem ipsum", no "{")
  compose in the registry query.

Scale shape: everything here is a per-row projection — no explode until the
caller chooses line granularity, no join, no aggregation. At 100 TB the
extraction cost is one codegen'd regex pass over the scan, and Catalyst
pushes any downstream source/lang predicate below it untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- the deterministic fixture template (single source of truth: the
# registry oracle interpolates these SAME constants into DuckDB SQL; no
# single quotes allowed — they would need doubling in the SQL literal) ---
MARKUP_HEAD = '<html><head><title>Doc '
MARKUP_MID = (
    '</title><style type="text/css">p{margin:0;}</style>'
    '<script type="text/javascript">var cookieConsent = true;</script>'
    '</head><body><nav class="menu"><a href="/">Home</a> | '
    '<a href="/login">Log in</a></nav><div id="content"><p>'
)
MARKUP_TAIL_DIV = '</p></div>'
MARKUP_FOOTER = (
    '<footer>This website uses cookies to improve your '
    'experience. &copy; 2024 Example Corp. All rights reserved.'
    '</footer></body></html>'
)
# kept as one constant for the oracle interpolation (link-less renders are
# byte-identical to the pre-link template)
MARKUP_TAIL = MARKUP_TAIL_DIV + MARKUP_FOOTER

# Sentence-ish boundaries become paragraph breaks in the fixture, so the
# extractor has real multi-line pages to filter. No lookbehind — RE2 (the
# DuckDB oracle's engine) has none; a capture + backreference replacement
# works identically under java.util.regex and RE2 (both leftmost-first).
_SENT_BREAK = "([.!?]) "

# Block-level closers → line breaks. Inline tags (<a>, <b>, ...) vanish
# without breaking the line, so nav pills land on one line as real
# extractors produce.
BLOCK_BREAK_RE = "</(p|div|h[1-6]|li|ul|ol|nav|footer|header|title)>|<br */?>"

# C4 §2.2 boilerplate-phrase blacklist (lowercase substring match), the
# RefinedWeb/FineWeb cookie/legal additions included.
BOILERPLATE_PHRASES = (
    "javascript",
    "cookies",
    "all rights reserved",
    "privacy policy",
    "terms of use",
)


def render_markup(
    text: Column,
    doc_id: Column,
    link_ids: Column | None = None,
    extra_block: Column | None = None,
) -> Column:
    """Wrap a clean text column in the deterministic HTML template.

    Escapes ``& < >`` (in that order — the inverse of the extractor's
    decode order) so a page containing literal markup characters round-
    trips, then splits sentence boundaries into ``</p><p>`` breaks.

    ``link_ids`` (optional, ``array<long>``): render a related-documents
    block ``<ul class="related"><li><a href="/doc/N">...</a></li>...</ul>``
    between the content div and the footer — the fixture for link-graph
    extraction (:func:`extract_link_ids`). Link-less renders are
    byte-identical to the pre-link template.

    ``extra_block`` (optional, string Column): verbatim HTML inserted
    after the links block, still inside ``<body>`` — e.g. the external
    sources block of :func:`render_source_links`.
    """
    esc = F.replace(text, F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    body = F.regexp_replace(esc, _SENT_BREAK, "$1</p><p>")
    if link_ids is None:
        links: Column = F.lit("")
    else:
        links = F.concat(
            F.lit('<ul class="related">'),
            F.array_join(
                F.transform(
                    link_ids,
                    lambda d: F.concat(
                        F.lit('<li><a href="/doc/'),
                        d.cast("string"),
                        F.lit('">Doc '),
                        d.cast("string"),
                        F.lit("</a></li>"),
                    ),
                ),
                "",
            ),
            F.lit("</ul>"),
        )
    return F.concat(
        F.lit(MARKUP_HEAD),
        doc_id.cast("string"),
        F.lit(MARKUP_MID),
        body,
        F.lit(MARKUP_TAIL_DIV),
        links,
        F.lit("") if extra_block is None else extra_block,
        F.lit(MARKUP_FOOTER),
    )


def render_source_links(urls: Column) -> Column:
    """``<p class="sources">`` block of absolute-URL anchors — the fixture
    for external-link extraction (:func:`extract_urls`)."""
    return F.concat(
        F.lit('<p class="sources">'),
        F.array_join(
            F.transform(
                urls,
                lambda u: F.concat(
                    F.lit('<a href="'), u, F.lit('">source</a>')
                ),
            ),
            "",
        ),
        F.lit("</p>"),
    )


def extract_link_ids(html: Column) -> Column:
    """``array<long>`` of internal-document link targets (`/doc/N` hrefs)
    in page order — the crawl-graph edge extractor (PageRank priors /
    frontier scheduling start here). Pure regexp, one pass per page."""
    return F.transform(
        F.regexp_extract_all(html, F.lit('<a href="/doc/([0-9]+)">'), 1),
        lambda s: s.cast("long"),
    )


def extract_urls(html: Column) -> Column:
    """``array<string>`` of absolute http(s) link targets in page order —
    the external half of the crawl graph (:func:`extract_link_ids` covers
    internal `/doc/N` links). Pure regexp, one pass per page. The scheme
    match is case-insensitive (schemes are, RFC 3986 §3.1 — and crawled
    HTML really does contain ``HTTPS://``); the canonicalizer is what
    folds the case."""
    return F.regexp_extract_all(
        html, F.lit('<a href="((?i:https?)://[^"]+)"'), 1
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the dedup key of a
    crawl frontier (r14 verdict #6). Pure Column (regexp + array ops,
    zero UDFs), policy:

    - scheme and host lowercased (case-insensitive per RFC 3986 §3.1/§3.2.2;
      the PATH keeps its case — it is not ours to fold);
    - the scheme's default port stripped (``:80`` http, ``:443`` https);
    - empty path -> ``/``; a trailing slash on a non-root path dropped;
    - query parameters sorted bytewise (order-insensitive servers are the
      crawl-world norm; sorting makes ``?a=1&b=2`` and ``?b=2&a=1`` one
      frontier entry), empty params dropped;
    - the fragment removed (never sent to the server).

    Deliberately NOT done: www-stripping and percent-decoding — both
    change which resource is addressed on real hosts.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, "/$", "")).otherwise(path)
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"),
                lambda x: x != "",
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Host component of an (ideally canonicalized) absolute URL."""
    return F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1)


def url_path(url: Column) -> Column:
    """Path component of an (ideally canonicalized) absolute URL — what a
    robots-style disallow rule matches against. On a canonicalized URL
    this is never empty (the canonicalizer normalizes an empty path to
    ``/``)."""
    return F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)


def strip_markup(html: Column) -> Column:
    """Markup → newline-separated text (the extraction chain).

    Order matters and is part of the contract (mirrored in the oracle):
    script/style subtrees first (their CONTENT must not leak), block
    closers → ``\\n``, remaining tags dropped, entities decoded AFTER
    tag-stripping (so user text containing literal ``<script>`` — escaped
    by any correct renderer — is never treated as markup), ``&amp;``
    decoded LAST (the inverse of escaping ``&`` first), horizontal
    whitespace collapsed.
    """
    t = F.regexp_replace(html, r"(?s)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?s)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, BLOCK_BREAK_RE, "\n")
    t = F.regexp_replace(t, r"<[^>]+>", "")
    t = F.replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.replace(t, F.lit("&quot;"), F.lit('"'))
    t = F.replace(t, F.lit("&#39;"), F.lit("'"))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    return F.regexp_replace(t, "[ \t]+", " ")


def extract_lines(html: Column) -> Column:
    """``array<string>`` of trimmed, non-empty extracted lines."""
    # lambda, NOT bare F.trim: transform feeds (element, index) to a
    # two-parameter callable, and trim's second parameter is the TRIM
    # CHARACTER SET — line i would get the digits of i trimmed off.
    return F.filter(
        F.transform(F.split(strip_markup(html), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def c4_keep_line(line: Column, *, min_words: int = 3) -> Column:
    """C4 §2.2 line filter over an already-trimmed, space-collapsed line:
    terminal punctuation, ≥ ``min_words`` words, no boilerplate phrase,
    no line-level ``{`` (the code-leak tell).

    ``min_words`` is KEYWORD-ONLY so this function is safe to pass bare to
    ``F.filter``/``F.transform``: a second positional parameter would be
    bound to the HOF's ELEMENT INDEX (PySpark feeds two-parameter callables
    ``(element, index)``), silently turning the word-count rule into
    "line i needs ≥ i words" (r14 review, confirmed empirically)."""
    keep = line.rlike('[.!?"]$')
    keep = keep & (F.size(F.split(line, " ")) >= min_words)
    low = F.lower(line)
    for phrase in BOILERPLATE_PHRASES:
        keep = keep & ~low.contains(phrase)
    return keep & ~line.contains("{")
