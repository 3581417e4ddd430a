"""operators/markup.py — HTML extraction + C4 line rules (SURVEY §2.13)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _extract(spark, rows):
    from hadoop_word_score_spark.operators.markup import (
        extract_lines,
        render_markup,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        "doc_id",
        extract_lines(render_markup(F.col("text"), F.col("doc_id"))).alias("ls"),
    ).orderBy("doc_id")


def test_content_region_roundtrips(spark):
    # Sentence boundaries become line breaks; the content tokens must
    # survive extraction exactly (render escapes, extractor decodes).
    out = _extract(spark, [(1, "First point. Second point! Third?")]).collect()[0]
    assert "First point." in out.ls
    assert "Second point!" in out.ls
    assert "Third?" in out.ls


def test_entities_roundtrip(spark):
    # Literal & < > in user text must survive the render->extract cycle
    # verbatim — i.e. never be interpreted as markup.
    txt = "a < b & b > c. Use <script> tags carefully."
    out = _extract(spark, [(1, txt)]).collect()[0]
    joined = "\n".join(out.ls)
    assert "a < b & b > c." in joined
    assert "<script> tags carefully." in joined  # not treated as a subtree


def test_boilerplate_lines_present_pre_filter(spark):
    # The fixture's nav/title/footer are real boilerplate: extraction keeps
    # them (extraction is lossless), the C4 rules must drop them.
    out = _extract(spark, [(5, "Real content lives here.")]).collect()[0]
    assert out.ls[0] == "Doc 5"
    assert out.ls[1] == "Home | Log in"
    assert any("cookies" in l for l in out.ls)


def test_script_style_subtree_content_never_leaks(spark):
    out = _extract(spark, [(1, "Body text.")]).collect()[0]
    joined = "\n".join(out.ls)
    assert "cookieConsent" not in joined  # script content
    assert "margin" not in joined  # style content


def test_trim_is_not_indexed(spark):
    # Regression: F.transform(ls, F.trim) fed (element, index) so trim's
    # second arg became the TRIM CHARACTER SET — line i lost the digits of
    # i at its ends. doc_id 0's title line is the canary.
    out = _extract(spark, [(0, "Zero must survive. 10 points to line 0.")]).collect()[0]
    assert out.ls[0] == "Doc 0"
    assert "10 points to line 0." in out.ls


def test_c4_line_rules(spark):
    from hadoop_word_score_spark.operators.markup import c4_keep_line

    df = spark.createDataFrame(
        [
            ("Good sentence with words.", True),
            ("No terminal punctuation here", False),
            ("Too. Short.", True),  # one line, 2 words -> fails min_words
            ("Enable javascript to continue.", False),
            ("This site uses cookies for ads.", False),
            ("All rights reserved.", False),
            ("function f() { return 1; }.", False),  # brace rule
        ],
        "line string, want boolean",
    )
    got = df.select("line", "want", c4_keep_line(F.col("line")).alias("got")).collect()
    for r in got:
        if r.line == "Too. Short.":
            assert not r.got  # 2 words < 3
        else:
            assert r.got == r.want, r.line


def test_funnel_page_rules(spark):
    # A page whose content yields < 3 kept lines is dropped at page level.
    from hadoop_word_score_spark.operators.markup import (
        c4_keep_line,
        extract_lines,
        render_markup,
    )

    df = spark.createDataFrame(
        [
            (1, "One good sentence here. Another good sentence follows. "
                "And a third keeps it alive."),
            (2, "just a fragment"),
        ],
        "doc_id long, text string",
    )
    ls = extract_lines(render_markup(F.col("text"), F.col("doc_id")))
    out = (
        df.select(
            "doc_id",
            F.size(F.filter(ls, lambda x: c4_keep_line(x))).alias("n_kept"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].n_kept >= 3
    assert out[1].n_kept < 3


def test_c4_keep_line_cannot_bind_hof_index(spark):
    # r14 review regression pin: passing the rule bare to F.filter once
    # bound the array INDEX to min_words (PySpark feeds two-parameter
    # callables (element, index)), silently replacing the >= 3 words rule
    # with ">= i words". min_words is now keyword-only, which PySpark's
    # HOF arity check rejects LOUDLY instead.
    import pytest
    from pyspark.errors import PySparkValueError

    from hadoop_word_score_spark.operators.markup import c4_keep_line

    df = spark.createDataFrame([([
        "Hi there.", "Hi there.", "Hi there.",
        "One two three four five six.",
    ],)], "ls array<string>")
    with pytest.raises(PySparkValueError):
        df.select(F.filter("ls", c4_keep_line)).collect()
    kept = df.select(
        F.filter("ls", lambda x: c4_keep_line(x)).alias("k")
    ).collect()[0].k
    # 2-word lines fail min_words REGARDLESS of position; the 6-word line
    # passes
    assert kept == ["One two three four five six."]


def test_link_rendering_and_extraction(spark):
    from hadoop_word_score_spark.operators.markup import (
        MARKUP_TAIL,
        extract_link_ids,
        render_markup,
    )

    df = spark.createDataFrame(
        [(3, "Some content here.", [7, 12])],
        "doc_id long, text string, links array<long>",
    )
    html = render_markup(F.col("text"), F.col("doc_id"), F.col("links"))
    row = df.select(
        html.alias("h"), extract_link_ids(html).alias("ids")
    ).collect()[0]
    assert '<a href="/doc/7">Doc 7</a>' in row.h
    assert row.ids == [7, 12]
    # link-less render is byte-identical to the pre-link template (the
    # oracle interpolates MARKUP_TAIL as one constant)
    plain = df.select(
        render_markup(F.col("text"), F.col("doc_id")).alias("h")
    ).collect()[0].h
    assert MARKUP_TAIL in plain
    assert '<ul class="related">' not in plain
    # extraction ignores non-/doc/ anchors (nav links) by construction
    assert df.select(
        extract_link_ids(
            render_markup(F.col("text"), F.col("doc_id"))
        ).alias("ids")
    ).collect()[0].ids == []


def test_canonicalize_url_policy_matrix(spark):
    # r14 verdict #6: the crawl-frontier dedup key. One row per policy
    # clause: scheme/host case folding (path case KEPT), default-port
    # stripping (scheme-specific), empty-path -> '/', trailing-slash drop
    # (root kept), bytewise query sort + empty-param drop, fragment
    # removal, non-default ports kept.
    from pyspark.sql import functions as F

    from hadoop_word_score_spark.operators.markup import canonicalize_url

    cases = [
        ("HTTPS://Example.COM:443/Page/?b=2&a=1#top",
         "https://example.com/Page?a=1&b=2"),
        ("http://HOST.com:80", "http://host.com/"),
        ("http://host.com:8080/x", "http://host.com:8080/x"),
        ("https://host.com:80/x", "https://host.com:80/x"),  # not https' default
        ("https://h.com/", "https://h.com/"),
        ("https://h.com/a/b/", "https://h.com/a/b"),
        ("https://h.com/x?&&b=2&&a=1&", "https://h.com/x?a=1&b=2"),
        ("https://h.com/x#only-frag", "https://h.com/x"),
        ("https://h.com/CaseKept", "https://h.com/CaseKept"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r.i: r.c for r in df.select(
        "i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_extract_urls_case_insensitive_scheme(spark):
    from pyspark.sql import functions as F

    from hadoop_word_score_spark.operators.markup import (
        extract_urls,
        render_markup,
        render_source_links,
    )

    df = spark.createDataFrame([(1, "Hello there. Second sentence.")],
                               "doc_id long, text string")
    urls = F.array(
        F.lit("HTTPS://A.com/x"), F.lit("http://b.com/y?q=1"),
        F.lit("https://c.com/z"),
    )
    page = df.select(
        render_markup(
            F.col("text"), F.col("doc_id"),
            extra_block=render_source_links(urls),
        ).alias("html")
    )
    got = page.select(extract_urls(F.col("html")).alias("u")).collect()[0].u
    # internal nav links (/ and /login) are NOT absolute -> excluded;
    # page order preserved; uppercase scheme captured verbatim
    assert got == ["HTTPS://A.com/x", "http://b.com/y?q=1", "https://c.com/z"]
