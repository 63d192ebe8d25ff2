"""CCHtml v1 (functions/html.py) — frozen-spec goldens + Spark↔DuckDB
differential parity (the cross-engine regex discipline that caught the
\\b/\\s divergences in CCPii; see tests/test_regex_parity.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pignlproc_spark.functions.html import (
    extract_pages,
    html_to_text_col,
    html_to_text_sql,
)

# (html, expected CCHtml v1 text) — frozen goldens. Changing any
# expectation is a spec change and needs a version bump (module
# docstring rule, same discipline as CCWikiText).
GOLDENS = [
    (
        '<!DOCTYPE html><html><head><title>T</title>'
        '<script type="text/javascript">var i=0; if (i<1) { i = 2 > 1 ? 3 : 4; }</script>'
        '<style>.a{color:red}</style></head><body><!-- nav -->'
        '<div class="nav">Home | <a href="/x">About</a></div>'
        "<h1>Doc 7</h1><p>hello  world</p><br/>"
        "<table><tr><td>k</td><td>v</td></tr></table></body></html>",
        "T\nHome | About\nDoc 7\nhello world\nk v",
    ),
    # entity gauntlet; &amp; last ⇒ a double-escaped &amp;lt; decodes
    # exactly once, to the literal text "&lt;" (correct HTML semantics)
    (
        "<p>&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;&nbsp;end</p>",
        '<tag> & "q" \'s\' end',
    ),
    ("<p>&amp;lt;double&amp;gt;</p>", "&lt;double&gt;"),
    # a < with a later > forms a (swallowed) tag; with none it passes
    ("a < b and c > d", "a d"),
    ("unclosed <div class=", "unclosed <div class="),
    # case-insensitive script close, attributes on the closer
    ("<SCRIPT>x</SCRIPT><Script src=x>y</script >z", "z"),
    # unterminated script/style: opener falls to the generic tag rule
    ("<style>a{}</style", "a{}</style"),
    # v1 does NOT preserve <pre> whitespace
    ("<pre>  spaced\n\tout  </pre>tail", "spaced\nout\ntail"),
    # \x0C collapses (HTML whitespace), \x0B passes through (not one)
    ("é CJK 漢字 \x0b vertical \x0c feed", "é CJK 漢字 \x0b vertical feed"),
    ("<p>line1</p>\n\n\n<p>line2</p>", "line1\nline2"),
    ("<br><br/><br />text", "text"),
    ("<!-- multi\nline\ncomment -->after", "after"),
    # beyond-the-table entities pass through untouched
    ("&amp;amp; &#x27; &unknown;", "&amp; &#x27; &unknown;"),
    ("", ""),
]


def test_goldens_spark(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(GOLDENS)], "i int, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text_col(F.col("html")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(GOLDENS):
        assert got[i] == want, f"case {i}"


def test_duckdb_parity_on_goldens():
    con = duckdb.connect()
    for i, (h, want) in enumerate(GOLDENS):
        con.execute("create or replace table t as select ? as html", [h])
        got = con.sql(f"select {html_to_text_sql('html')} as t from t").fetchone()[0]
        assert got == want, f"case {i}"


@pytest.mark.parametrize(
    "probe",
    [
        None,  # null html must not crash and stays null
        "\x00 nul <p>byte</p>",
        "<p>" + "x" * 20000 + "</p>",  # long body, no catastrophic backtrack
        "<" * 500 + ">" * 500,  # pathological angle-bracket runs
    ],
)
def test_extraction_robust(spark, probe):
    df = spark.createDataFrame([(probe,)], "html string")
    out = df.select(html_to_text_col(F.col("html")).alias("t")).collect()[0].t
    if probe is None:
        assert out is None
    else:
        assert out is not None


def test_differential_fuzz_spark_vs_duckdb(spark):
    """Deterministic fuzz: tag/entity/whitespace soup with the unicode
    probes that found real Java-vs-RE2 divergences before."""
    import itertools

    frags = [
        "<p>", "</p>", "<div a=b>", "text", "é", "漢", "\x0b", "\x0c", "\t",
        "&amp;", "&lt;", "<script>", "</script>", "x<y", "<!-- c -->", "\n",
        "<BR/>", "&nbsp;", "< div>", "e>f",
    ]
    cases = []
    for i, combo in enumerate(itertools.permutations(frags, 3)):
        if i % 97 == 0:  # 71 deterministic samples of the 6840 triples
            cases.append("".join(combo))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text_col(F.col("html")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        con.execute("create or replace table t as select ? as html", [c])
        want = con.sql(f"select {html_to_text_sql('html')} as t from t").fetchone()[0]
        assert got[i] == want, f"fuzz case {i}: {c!r}"


def test_extract_pages_plan_is_pure_projection(spark):
    """CCHtml extraction must stay a no-shuffle, no-Python projection
    (the same single-stage property the wiki parse path has)."""
    pages = spark.createDataFrame([("u", "<p>x</p>")], "url string, html string")
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# (html, expected raw hrefs in document order) — frozen CCLink v1
# goldens: every decoy class the spec rules out, plus the match forms
# it rules in. Changing an expectation is a spec change (version bump).
HREF_GOLDENS = [
    ('<a href="https://x.example/a">t</a>', ["https://x.example/a"]),
    # uppercase tag/attr match; the VALUE must come back uncased
    ('<A HREF="//X.example/B">t</A>', ["//X.example/B"]),
    # attributes before href, whitespace around =
    ('<a class="n" id=q href = "/p">t</a>', ["/p"]),
    ('<a\thref="/tab">t</a>', ["/tab"]),
    # document order over multiple anchors
    ('<a href="/1">a</a><p><a href="/2">b</a>', ["/1", "/2"]),
    # --- decoys: must NOT match ---
    ('<abbr href="https://no.example/">t</abbr>', []),
    ('<area href="https://no.example/">', []),
    ('<a hreflang="de">t</a>', []),  # hreflang is not href
    ('<a data-xhref="https://no.example/">t</a>', []),  # no WS before href
    ("<a href=unquoted.html>t</a>", []),  # v1: double-quoted only
    ("<a href='single.html'>t</a>", []),  # v1: double-quoted only
    ('<ahref="https://no.example/">t</a>', []),  # WS after tag required
    ('href="https://no.example/" outside any tag', []),
    # fragment-only and empty values DO match the scan (resolution drops)
    ('<a href="#top">t</a><a href="">e</a>', ["#top", ""]),
]


def test_href_goldens_spark(spark):
    from pignlproc_spark.functions.html import extract_hrefs_col

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HREF_GOLDENS)], "i int, html string"
    )
    got = {
        r.i: r.h
        for r in df.select("i", extract_hrefs_col(F.col("html")).alias("h")).collect()
    }
    for i, (_, want) in enumerate(HREF_GOLDENS):
        assert got[i] == want, f"case {i}"


def test_href_duckdb_parity_on_goldens():
    from pignlproc_spark.functions.html import extract_hrefs_sql

    con = duckdb.connect()
    for i, (h, want) in enumerate(HREF_GOLDENS):
        con.execute("create or replace table t as select ? as html", [h])
        got = con.sql(f"select {extract_hrefs_sql('html')} as h from t").fetchone()[0]
        assert got == want, f"case {i}"


def test_resolve_href_rules(spark):
    """CCLink v1 resolution: absolute kept, protocol-relative gets
    https, host-relative joins the base host, everything else NULL."""
    from pignlproc_spark.functions.urls import resolve_href_col

    cases = [
        ("https://a.example/x", "https://a.example/x"),
        ("HTTP://a.example/x", "HTTP://a.example/x"),  # kept VERBATIM
        ("ftp+x.y://a.example/f", "ftp+x.y://a.example/f"),
        ("//cdn.example/j", "https://cdn.example/j"),
        ("/p/1", "https://base.example/p/1"),
        ("relative.html", None),
        ("#frag", None),
        ("", None),
        ("mailto:x@y.example", None),  # scheme: but not scheme://
        ("javascript:void(0)", None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, href string"
    )
    got = {
        r.i: r.r
        for r in df.select(
            "i", resolve_href_col(F.col("href"), F.lit("base.example")).alias("r")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}"


# (html, expected (href, normalized text) pairs in document order) —
# frozen CCLink v1 PAIRED-scan goldens. The element scan trades recall
# for cross-engine exactness: nested-markup bodies are out of spec.
ANCHOR_GOLDENS = [
    ('<a href="/x">plain</a>', [("/x", "plain")]),
    # attributes after the href value; whitespace-normalized body
    ('<a href="/y" class="n">\tread   more </a>', [("/y", "read more")]),
    # uppercase tag, spaced close tag
    ('<A HREF="/Z">t</A >', [("/Z", "t")]),
    # empty body is a match (empty surface form)
    ('<a href="/e"></a>', [("/e", "")]),
    # document order over multiple anchors
    (
        '<a href="/1">a</a> mid <a href="/2">b</a>',
        [("/1", "a"), ("/2", "b")],
    ),
    # --- out of spec: must NOT match the paired scan ---
    ('<a href="/skip"><b>nested</b></a>', []),  # markup in body
    ('<a href="/open">never closed', []),
    ("<a href='/sq'>t</a>", []),  # single-quoted value (v1 rule)
    ('<abbr href="/no">t</abbr>', []),  # decoy tag
    ('<a hreflang="de">t</a>', []),  # decoy attribute
]


def test_anchor_pair_goldens_spark(spark):
    from pignlproc_spark.functions.html import (
        anchor_elems_col,
        anchor_href_col,
        anchor_text_col,
    )

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(ANCHOR_GOLDENS)], "i int, html string"
    )
    elem = F.explode(anchor_elems_col(F.col("html"))).alias("elem")
    rows = (
        df.select("i", elem)
        .select(
            "i",
            anchor_href_col(F.col("elem")).alias("href"),
            anchor_text_col(F.col("elem")).alias("text"),
        )
        .collect()
    )
    got: dict[int, list] = {i: [] for i in range(len(ANCHOR_GOLDENS))}
    for r in rows:  # explode preserves array (document) order per row
        got[r.i].append((r.href, r.text))
    for i, (_, want) in enumerate(ANCHOR_GOLDENS):
        assert got[i] == want, f"case {i}"


def test_anchor_pair_duckdb_parity_on_goldens():
    from pignlproc_spark.functions.html import (
        anchor_elems_sql,
        anchor_href_sql,
        anchor_text_sql,
    )

    con = duckdb.connect()
    for i, (h, want) in enumerate(ANCHOR_GOLDENS):
        con.execute("create or replace table t as select ? as html", [h])
        got = con.sql(
            f"select {anchor_href_sql('elem')}, {anchor_text_sql('elem')} "
            f"from (select unnest({anchor_elems_sql('html')}) as elem from t)"
        ).fetchall()
        assert [tuple(r) for r in got] == want, f"case {i}"


# ====================================================================
# CCMeta v1 — head metadata
# ====================================================================

META_DOCS = [
    # decoys: commented-out title+canonical, data-name=, xdescription;
    # both attribute orders; whitespace-normalized title; 2 hreflangs
    (
        '<html><head><!-- <title>decoy</title>'
        ' <link rel="canonical" href="https://no.example/x"> -->'
        "<tItLe> My\t Host --  page  7 </TITLE>"
        '<meta name="xdescription" content="no">'
        '<meta data-name="description" content="no2">'
        '<meta name="description" content="A real desc">'
        '<link href="https://ex.com/c7" rel="canonical">'
        '<meta content="noindex,nofollow" name="robots">'
        '<link rel="alternate" hreflang="de" href="/de">'
        '<link hreflang="fr" href="/fr"></head></html>'
    ),
    # empty title == absent; robots without noindex
    '<html><head><title></title><meta name="robots" content="index"></head></html>',
    "<p>nothing at all</p>",
    # key-first canonical; single-quoted attrs are out of spec (v1)
    "<link rel=\"canonical\" href=\"https://kv.example/\">"
    "<meta name='description' content='single-quoted out of spec'>",
]

META_WANT = [
    ("My Host -- page 7", "https://ex.com/c7", "A real desc", True, 2),
    (None, None, None, False, 0),
    (None, None, None, False, 0),
    (None, "https://kv.example/", None, False, 0),
]


def test_page_metadata_spark(spark):
    from pignlproc_spark.functions.html import page_metadata

    df = spark.createDataFrame([(d,) for d in META_DOCS], "html string")
    got = [tuple(r) for r in page_metadata(df).drop("html").collect()]
    assert got == META_WANT


def test_page_metadata_duckdb_parity():
    """The SQL twins, rendered from the SAME frozen patterns, agree
    value-for-value — including every decoy."""
    import duckdb

    from pignlproc_spark.functions import html as H

    con = duckdb.connect()
    con.execute("CREATE TABLE t(html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(d,) for d in META_DOCS])
    s = H.strip_comments_sql("html")
    sql = f"""
    SELECT {H.page_title_sql(s)}, {H.canonical_link_sql(s)},
           {H.meta_content_sql(s, 'description')},
           coalesce(contains({H.meta_content_sql(s, 'robots')}, 'noindex'), false),
           len({H.hreflang_langs_sql(s)})::BIGINT
    FROM t
    """
    assert [tuple(r) for r in con.sql(sql).fetchall()] == META_WANT
