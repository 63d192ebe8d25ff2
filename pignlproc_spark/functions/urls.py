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
