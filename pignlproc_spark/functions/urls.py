"""URL normalization for web-page corpora — pure Spark built-ins.

Not in the reference (pignlproc's pages come pre-keyed by wiki title;
see SURVEY.md §1.3), but the canonical-input contract here is a table
of Common-Crawl-style web pages keyed by ``url``, and at 100 TB the
first dedup lever is URL canonicalization: the same page crawled as
``http://Host/path#frag``, ``http://host/path/`` and
``http://host:80/path`` must collapse to ONE key before any
content-level dedup runs (it removes the bulk of trivial duplicates
for the cost of a projection, no shuffle at all).

Frozen spec "CCUrl v1" (regexp-only, so the identical rules run
codegen'd in Spark AND in the DuckDB oracle — both engines' regexes
are RE2-compatible: no lookaround, no backrefs):

1. trim ASCII whitespace;
2. if the value does not look like ``scheme://host...``, return it
   trimmed and otherwise untouched (relative/garbage rows are not
   guessed at);
3. lowercase scheme and host (NEVER path/query — those are
   case-significant);
4. drop a default port (``:80`` for http, ``:443`` for https);
5. drop the fragment (``#...``);
6. drop a trailing ``?`` (empty query);
7. strip trailing slashes from the path ("" and "/" both mean the
   root and canonicalize to no-path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+[^?#]*(\?[^#]*)"


def host_col(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL; '' for non-URLs."""
    return F.lower(F.regexp_extract(F.trim(url), _HOST_RE, 1))


def canonical_url_col(url: Column) -> Column:
    """CCUrl v1 canonical form (see module docstring)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    raw_host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.when(scheme == "http", F.regexp_replace(raw_host, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(raw_host, ":443$", "")).otherwise(raw_host)
    )
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    query = F.regexp_replace(F.regexp_extract(u, _QUERY_RE, 1), r"^\?$", "")
    # empty-host URLs ('file:///x', 'http://#f') fall under rule 2: a
    # canonicalizer must never merge distinct inputs it cannot parse
    return F.when((scheme == "") | (raw_host == ""), u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, query)
    )


def resolve_href_col(href: Column, base_host: Column) -> Column:
    """Absolute URL of a raw ``<a href>`` value against its page's host
    — the resolution half of the frozen "CCLink v1" spec (the scan half
    is ``functions/html.HREF_RE``). Rules, in order:

    1. already absolute (``scheme://...``) → kept verbatim;
    2. protocol-relative (``//host/...``) → ``https:`` prepended (v1
       freezes https as the assumed scheme — the crawl's own);
    3. host-relative (``/path``) → ``https://`` + base host + href;
    4. anything else → NULL (page-relative paths, ``#fragment``,
       ``mailto:``/``javascript:`` pseudo-links — v1 deliberately does
       not guess a base *path*, only a base host, so these drop).

    Pure codegen'd CASE over one regexp + two prefix tests: the
    link-graph edge feed stays a projection, no Python, no shuffle."""
    return (
        F.when(href.rlike(_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(F.lit("https:"), href))
        .when(href.startswith("/"), F.concat(F.lit("https://"), base_host, href))
        .otherwise(F.lit(None).cast("string"))
    )


def resolve_href_sql(href: str, base_host: str) -> str:
    """DuckDB twin of :func:`resolve_href_col` — the SAME rule order
    over SQL expressions, for the driver-oracle differential."""
    return f"""CASE
      WHEN regexp_matches({href}, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN {href}
      WHEN starts_with({href}, '//') THEN 'https:' || {href}
      WHEN starts_with({href}, '/') THEN 'https://' || {base_host} || {href}
      END"""


def blocklist_filter(pages, blocked_hosts, blocked_prefixes=(), url_col: str = "url"):
    """(url, host, host_blocked, prefix_blocked, keep) — UT1-style
    crawl blocklist filter (the adult/spam/quota domain bans every
    production web corpus applies before content-level curation;
    RefinedWeb §3.1 uses exactly this host-list + URL-pattern pair).

    ``blocked_hosts``: a DataFrame with a ``host`` column (CCUrl v1
    lowercased host[:port] form). Real lists are a few million rows —
    megabytes, so the join side is explicitly broadcast: the filter
    costs a map-side hash probe per page, NO shuffle of the crawl.
    ``blocked_prefixes``: literal URL prefixes, OR-folded into one
    codegen'd predicate (no join at all).

    Flags are INTs and ``keep = 1 - max(flags)`` so the output is
    oracle-hashable and composes with the other gate columns
    (textstats.corpus_filter convention).
    """
    u = F.col(url_col)
    host = host_col(u)
    bl = blocked_hosts.select(F.col("host").alias("_bl_host")).distinct()
    out = pages.select(u.alias("url"), host.alias("host")).join(
        F.broadcast(bl), F.col("host") == F.col("_bl_host"), "left"
    )
    prefix_hit = F.lit(False)
    for p in blocked_prefixes:
        prefix_hit = prefix_hit | F.col("url").startswith(p)
    return out.select(
        "url",
        "host",
        F.col("_bl_host").isNotNull().cast("int").alias("host_blocked"),
        prefix_hit.cast("int").alias("prefix_blocked"),
    ).withColumn(
        "keep",
        (1 - F.greatest("host_blocked", "prefix_blocked")).cast("int"),
    )


def domain_quota(pages, k: int, url_col: str = "url"):
    """At most ``k`` pages per host, deterministically (url ascending) —
    the standard crawl-curation cap that stops megasites from dominating
    a training mix. Returns (host, url, rank) for the keepers.

    Scale shape: ONE shuffle on host, then a within-partition sort +
    running row_number — no global sort, no self-join; a skewed
    megahost is one partition's sort (AQE splits it if it dominates).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    u = F.col(url_col)
    w = Window.partitionBy(host_col(u)).orderBy(u.asc())
    return (
        pages.select(host_col(u).alias("host"), u.alias("url"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("host", "url", F.col("rank").cast("int").alias("rank"))
    )


def template_quota(pages, k: int, url_col: str = "url"):
    """At most ``k`` urls per (host, PATH TEMPLATE), deterministically
    (url ascending) — the crawler-trap guard: calendar pages, session
    ids and faceted listings all collapse to one template whose
    membership explodes, and capping the template bounds the damage
    while leaving legitimate flat sites untouched (they have many
    templates with few urls each). Returns (host, template, url, rank)
    for the keepers; templates per :func:`url_templates` (digit runs →
    ``{n}``, query/fragment never count).

    Scale shape: ONE shuffle on (host, template), then a
    within-partition sort + running row_number — same stance as
    :func:`domain_quota` (a trap template is one partition's sort;
    AQE splits it if it dominates)."""
    if k < 1:
        raise ValueError(f"template_quota needs k >= 1; got {k}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    u = F.col(url_col)
    keyed = pages.select(
        host_col(u).alias("host"),
        _template_col(u).alias("template"),
        u.alias("url"),
    )
    w = Window.partitionBy("host", "template").orderBy(F.col("url").asc())
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("host", "template", "url", F.col("rank").cast("int").alias("rank"))
    )


def _robots_groups(robots, host_col_name: str, body_col: str):
    """Shared CCRobots v1 line/group machinery: the (tagged, agents)
    pair — every directive line with its group_start, and the agent
    names per group — consumed by :func:`parse_robots` (allow /
    disallow rules) and :func:`robots_crawl_delay`."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col_name).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        # strip comments, then whitespace
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    kv = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract("line", "^([A-Za-z-]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[A-Za-z-]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key") != "")
    # a rule line belongs to the most recent user-agent run above it.
    # RFC 9309 groups several consecutive User-agent lines: a UA line
    # directly preceded by another UA line continues the same group,
    # so the group key is the line_no of the run's FIRST UA line.
    # Blank/comment/garbage lines (key = '') are dropped BEFORE the
    # adjacency test — RFC 9309 ignores them entirely, and a comment
    # between two UA lines must not split the run (it would silently
    # detach the rules from the '*' group).
    w = Window.partitionBy("host").orderBy("line_no")
    tagged = kv.withColumn(
        "_ua_line", F.when(F.col("key") == "user-agent", F.col("line_no"))
    ).withColumn(
        "_prev_key", F.lag("key").over(w)
    ).withColumn(
        "_ua_start",
        F.when(
            (F.col("key") == "user-agent") & (F.col("_prev_key") == "user-agent"), None
        ).otherwise(F.col("_ua_line")),
    ).withColumn("group_start", F.last("_ua_start", ignorenulls=True).over(w))
    agents = (
        tagged.where(F.col("key") == "user-agent")
        .select("host", "group_start", F.lower("value").alias("agent"))
        .distinct()
    )
    return tagged, agents


def parse_robots(robots, host_col_name: str = "host", body_col: str = "body"):
    """(host, rule_idx, allow INT, path_prefix) — the ``User-agent: *``
    rule groups of each robots.txt body, as a relational parse
    ("CCRobots v1", an RFC 9309 subset: literal path prefixes only —
    no ``*``/``$`` wildcards; unknown directives ignored; a group is
    one or more consecutive User-agent lines followed by its rules).

    Relational shape: one explode of the body's lines, a running
    last-User-agent window per host (the only per-host ordering), and
    a filter to the ``*`` groups — no Python, no per-host loops.
    """
    tagged, agents = _robots_groups(robots, host_col_name, body_col)
    rules = tagged.where(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "") & F.col("group_start").isNotNull()
    ).select(
        "host",
        "group_start",
        F.col("line_no").alias("rule_idx"),
        (F.col("key") == "allow").cast("int").alias("allow"),
        F.col("value").alias("path_prefix"),
    )
    # the agents table is a handful of rows per host — broadcast the
    # semi-join key set rather than letting unknown stats pick an SMJ
    return (
        rules.join(
            F.broadcast(agents.where(F.col("agent") == "*")),
            ["host", "group_start"],
            "left_semi",
        )
        .select("host", "rule_idx", "allow", "path_prefix")
    )


def robots_crawl_delay(robots, host_col_name: str = "host", body_col: str = "body"):
    """(host, crawl_delay_s BIGINT) — the ``Crawl-delay`` of each
    host's ``User-agent: *`` groups (the de-facto politeness directive
    fetch schedulers honor; not in RFC 9309, so frozen here as a
    CCRobots v1 extension): INTEGER-seconds values of 1–18 digits
    only (anything else — fractions, empty, words, or a value that
    would overflow BIGINT under ANSI cast; robots.txt is arbitrary
    web input — is ignored, frozen), and the MAX across a host's
    ``*`` groups wins (the conservative reading when directives
    conflict). Hosts without the directive emit no row — the
    scheduler's own default applies.

    Scale shape: same single line-explode as :func:`parse_robots`,
    then one partial/final MAX per host."""
    tagged, agents = _robots_groups(robots, host_col_name, body_col)
    delays = tagged.where(
        (F.col("key") == "crawl-delay")
        & F.col("value").rlike("^[0-9]{1,18}$")
        & F.col("group_start").isNotNull()
    )
    starred = delays.join(
        F.broadcast(agents.where(F.col("agent") == "*")),
        ["host", "group_start"],
        "left_semi",
    )
    return starred.groupBy("host").agg(
        F.max(F.col("value").cast("bigint")).alias("crawl_delay_s")
    )


def host_link_edges(pages, url_col: str = "url", html_col: str = "html"):
    """(src_host, dst_host, n_links) — the host-level link graph of a
    crawled pages table: CCLink v1 href scan over the html, each href
    resolved against the page's host, then one count agg per host
    pair. The edge feed PageRank / TrustRank / HITS / components and
    the crawl frontier all consume.

    Scale shape: scan-side projection + explode + a single
    partial/final agg — pages never shuffle at page granularity, only
    the (src_host, dst_host) pairs do."""
    from pignlproc_spark.functions.html import extract_hrefs_col

    u = F.col(url_col)
    hrefs = pages.select(
        host_col(u).alias("src_host"),
        F.explode(extract_hrefs_col(F.col(html_col))).alias("href"),
    )
    resolved = hrefs.select(
        "src_host",
        resolve_href_col(F.col("href"), F.col("src_host")).alias("_r"),
    ).where(F.col("_r").isNotNull())
    return (
        resolved.select("src_host", host_col(F.col("_r")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )


def url_templates(pages, url_col: str = "url"):
    """(host, template, n_urls) — URL path templates: every maximal
    digit run in the PATH replaced by ``{n}`` (query/fragment never
    count — they are not part of the CCUrl path), then one count agg
    per (host, template). The crawl-engineering workhorse this feeds:
    template-level frontier budgeting (cap ``/product/{n}/review-{n}``
    at N fetches per host) and crawler-trap detection (one template
    exploding to millions of urls = an infinite space, not content).

    Scale shape: codegen'd regex projection + one partial/final count
    — urls never shuffle, only (host, template) pairs do."""
    u = F.col(url_col)
    return (
        pages.select(host_col(u).alias("host"), _template_col(u).alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
    )


def _template_col(u) -> "Column":
    """The frozen template derivation shared by :func:`url_templates`
    and :func:`template_quota`: path (empty → '/'), digit runs → {n}."""
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    return F.regexp_replace(path, "[0-9]+", "{n}")


def robots_sitemaps(robots, host_col_name: str = "host", body_col: str = "body"):
    """(host, sitemap_url) — the ``Sitemap:`` directives of each
    robots.txt body (CCRobots v1 extension). Per the sitemaps.org
    protocol the directive is GROUP-INDEPENDENT: it counts wherever it
    appears, inside or outside any User-agent group, and the value
    keeps its case (URLs are case-sensitive past the host). Empty
    values drop; duplicates within one host dedup. This is the
    discovery bridge: robots.txt → sitemap urls →
    :func:`parse_sitemap_routed` → frontier candidates.

    Scale shape: the same single line-explode as the verdict parse,
    one distinct on (host, url)."""
    tagged, _ = _robots_groups(robots, host_col_name, body_col)
    return (
        tagged.where((F.col("key") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def robots_filter(pages, rules, url_col: str = "url"):
    """(url, host, allow INT, matched_prefix) — the RFC 9309 verdict of
    CCRobots v1 rules for every page: among the host's matching rules
    the LONGEST path prefix wins; on a length tie Allow wins; a URL
    with no matching rule (or no rules at all for its host) is
    allowed.

    Scale shape: the rules table is a parsed robots corpus — a few
    rows per host, megabytes for millions of hosts — so it arrives
    broadcast; the verdict is one map-side probe + a partial/final
    max-struct aggregate keyed by url, NO crawl-side window sort.
    """
    u = F.col(url_col)
    pages_h = pages.select(u.alias("url"), host_col(u).alias("host")).withColumn(
        "path",
        F.when(F.regexp_extract("url", _PATH_RE, 1) == "", "/").otherwise(
            F.regexp_extract("url", _PATH_RE, 1)
        ),
    )
    joined = pages_h.join(F.broadcast(rules), "host", "left").withColumn(
        "_match",
        F.when(
            F.col("path_prefix").isNotNull() & F.col("path").startswith(F.col("path_prefix")),
            F.struct(
                F.length("path_prefix").alias("plen"),
                F.col("allow").alias("allow"),
                F.col("path_prefix").alias("prefix"),
            ),
        ),
    )
    best = joined.groupBy("url", "host").agg(F.max("_match").alias("best"))
    return best.select(
        "url",
        "host",
        F.coalesce(F.col("best.allow"), F.lit(1)).cast("int").alias("allow"),
        F.col("best.prefix").alias("matched_prefix"),
    )


def parse_sitemap(sitemaps, host_col_name: str = "host", body_col: str = "body"):
    """(host, loc, n_locs) — the ``<loc>`` URL entries of each
    sitemap.xml body ("CCSitemap v1": regex-level parse — sitemaps in
    the wild are machine-generated and flat, so ``<loc>([^<]*)</loc>``
    with entity decode of the XML five covers the format; no XML
    parser dependency, fully codegen'd).

    Scale shape: one regexp_extract_all + explode per sitemap row —
    the discovery side of a crawl frontier. n_locs rides along so a
    frontier loader can budget per host without re-grouping.
    """
    locs = sitemaps.select(
        F.col(host_col_name).alias("host"),
        F.explode(F.regexp_extract_all(F.col(body_col), F.lit("<loc>([^<]*)</loc>"), 1)).alias(
            "raw_loc"
        ),
    )
    from pyspark.sql import Window

    return (
        locs.select("host", F.trim(_xml_entity_decode(F.col("raw_loc"))).alias("loc"))
        .withColumn("n_locs", F.count(F.lit(1)).over(Window.partitionBy("host")).cast("bigint"))
    )


def _xml_entity_decode(col):
    """The five XML predefined entities; &amp; last (CCSitemap v1)."""
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def parse_sitemap_routed(sitemaps, host_col_name: str = "host", body_col: str = "body"):
    """(host, kind, loc) — CCSitemap v1 extended with INDEX routing:
    a body whose root element is ``<sitemapindex>`` yields
    ``kind='sitemap'`` rows (child sitemap URLs, the fetcher's next
    hop), anything else ``kind='page'`` (frontier candidates). Root
    sniff = the literal ``<sitemapindex`` tag-open anywhere in the
    body (frozen): sitemap files are machine-generated with exactly
    one root, so element-scoped scanning buys nothing over the sniff.
    Same ``<loc>`` scan + entity decode as :func:`parse_sitemap` —
    one codegen'd projection per body, no XML parser."""
    kind = F.when(
        F.col(body_col).contains("<sitemapindex"), F.lit("sitemap")
    ).otherwise(F.lit("page"))
    routed = sitemaps.select(
        F.col(host_col_name).alias("host"),
        kind.alias("kind"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit("<loc>([^<]*)</loc>"), 1)
        ).alias("raw_loc"),
    )
    return routed.select(
        "host", "kind", F.trim(_xml_entity_decode(F.col("raw_loc"))).alias("loc")
    )


def host_split(pages, train_pct: int = 80, valid_pct: int = 10, url_col: str = "url"):
    """(host, bucket, split, n_pages) — leakage-safe train/valid/test
    assignment at HOST granularity: the split is a pure function of
    md5(host) (textstats.hash_bucket's frozen first-4-hex form), so
    every page of a host lands in the same split by construction —
    the leakage guard an LLM-data pipeline needs when near-duplicate
    pages within a site would otherwise straddle train and eval
    (mirrors the contamination rationale of dedup.decontaminate, but
    enforced structurally instead of detected after the fact).

    ``train_pct`` / ``valid_pct`` are integer percents (buckets
    [0, train) → train, [train, train+valid) → valid, rest → test).

    Scale shape: one groupBy(host) count — the entity-dimension
    aggregate, map-side combined — then the split label is a codegen'd
    CASE on the md5 bucket. Nothing joins, nothing sorts; downstream
    writers filter on ``split`` and inherit determinism across reruns
    and cluster sizes (the hash depends on the host string only).
    """
    if not (0 < train_pct and 0 <= valid_pct and train_pct + valid_pct <= 100):
        raise ValueError("percents must satisfy 0 < train, 0 <= valid, train+valid <= 100")
    from pignlproc_spark.operators.textstats import hash_bucket

    u = F.col(url_col)
    hosts = pages.select(host_col(u).alias("host")).groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages")
    )
    bucket = hash_bucket(F.col("host"), 100)
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return hosts.select(
        "host", bucket.cast("bigint").alias("bucket"), split.alias("split"), "n_pages"
    )
