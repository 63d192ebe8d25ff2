"""NTriples line sources.

Reference parity: ``pignlproc/storage/AbstractNTriplesLoader.java`` +
``UriUriNTriplesLoader`` + ``UriStringLiteralNTriplesLoader`` (J4a–c,
SURVEY.md §2.1): line-parse ``<s> <p> <o> .`` / ``<s> <p> "lit" .``,
skip malformed/comment lines, filter to one RDF property, optional
prefix stripping.

Pure built-ins: ``spark.read.text`` + ``regexp_extract`` — predicate
filtering and column pruning push into the scan; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_URI_URI = r"^<([^>]+)>\s+<([^>]+)>\s+<([^>]+)>\s*\.\s*$"
_URI_LIT = r'^<([^>]+)>\s+<([^>]+)>\s+"((?:[^"\\]|\\.)*)"(?:@[\w-]+|\^\^<[^>]+>)?\s*\.\s*$'


def read_uri_uri(
    spark: SparkSession, path: str, property_uri: str, strip_prefix: str | None = None
) -> DataFrame:
    """(subj, obj) rows for one URI-object property (J4b)."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _URI_URI, 1).alias("subj"),
        F.regexp_extract("value", _URI_URI, 2).alias("pred"),
        F.regexp_extract("value", _URI_URI, 3).alias("obj"),
    ).where((F.col("subj") != "") & (F.col("pred") == property_uri))
    out = parsed.select("subj", "obj")
    if strip_prefix:
        # LITERAL prefix strip (the reference's startsWith semantics):
        # splicing the prefix into a regex would let '.' in any URI
        # prefix match arbitrary chars and '(' / '+' throw
        # PatternSyntaxException at execution time
        n = len(strip_prefix)

        def _strip(c):
            return F.when(
                F.col(c).startswith(strip_prefix), F.substring(F.col(c), n + 1, 1 << 30)
            ).otherwise(F.col(c))

        out = out.select(_strip("subj").alias("subj"), _strip("obj").alias("obj"))
    return out


def read_uri_literal(spark: SparkSession, path: str, property_uri: str) -> DataFrame:
    """(subj, lit) rows for one literal-object property (J4c);
    unescapes \" and \\\\ like the reference's literal handling."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _URI_LIT, 1).alias("subj"),
        F.regexp_extract("value", _URI_LIT, 2).alias("pred"),
        F.regexp_extract("value", _URI_LIT, 3).alias("lit"),
    ).where((F.col("subj") != "") & (F.col("pred") == property_uri))
    unesc = F.regexp_replace(F.regexp_replace("lit", r'\\"', '"'), r"\\\\", r"\\")
    return parsed.select("subj", unesc.alias("lit"))
