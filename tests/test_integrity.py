"""KG integrity audit (operators/integrity.py), the leakage-safe host
split (functions/urls.host_split), and the vocabulary-profile stats
(textstats.count_of_counts / vocab_growth) — hand-computed fixtures."""

import hashlib

import pytest

from pignlproc_spark.functions.urls import host_split
from pignlproc_spark.operators import integrity, textstats

TRIPLE_SCHEMA = "subj string, pred string, obj string, weight long"


def test_graph_audit_checks_fire(spark):
    t = spark.createDataFrame(
        [
            ("a", "kg:linksTo", "x", 2),
            ("a", "kg:linksTo", "a", 1),  # self loop
            ("b", "kg:uriCount", "3", 3),
            ("b", "kg:uriCount", "4", 4),  # functional violation
            ("c", "kg:uriCount", "5", 5),
            ("d", "kg:mentions", "x", 1),
            ("d", "kg:mentions", "x", 1),  # exact duplicate triple
            ("e", "kg:totalCount", "-1", -1),  # sentinel = bad weight
            ("f", "kg:annotatedCount", "7", 7),
            ("f", "kg:annotatedCount", None, 7),  # join key gone NULL
            ("g", "kg:annotatedCount", None, 1),
            ("g", "kg:annotatedCount", None, 1),  # dup of the NULL triple
            ("h", "kg:totalCount", "2", None),  # weight gone NULL = bad
        ],
        TRIPLE_SCHEMA,
    )
    rows = {r.pred: r for r in integrity.graph_audit(t).collect()}
    assert set(rows) == {
        "kg:linksTo", "kg:uriCount", "kg:mentions", "kg:totalCount", "kg:annotatedCount",
    }
    lt = rows["kg:linksTo"]
    assert (lt.n_triples, lt.n_subj, lt.max_fanout) == (2, 1, 2)
    assert (lt.n_self_loops, lt.n_dup_triples, lt.n_functional_violations) == (1, 0, 0)
    uc = rows["kg:uriCount"]
    assert (uc.n_triples, uc.n_subj, uc.n_functional_violations) == (3, 2, 1)
    assert uc.n_dup_triples == 0  # distinct objects are multi-edges, not dups
    assert rows["kg:mentions"].n_dup_triples == 1
    assert rows["kg:totalCount"].n_bad_weight == 2  # -1 sentinel + NULL
    assert rows["kg:linksTo"].n_bad_weight == 0
    # NULL objects: counted explicitly, treated as ONE distinct value
    ac = rows["kg:annotatedCount"]
    assert ac.n_null_obj == 3
    assert ac.n_functional_violations == 1  # f: real obj + NULL
    assert ac.n_dup_triples == 1  # g's second NULL row, not 3 phantoms
    assert rows["kg:uriCount"].n_null_obj == 0


def test_dangling_refs_anti_join(spark):
    t = spark.createDataFrame(
        [
            ("u1", "kg:uriCount", "7", 7),
            ("d1", "kg:mentions", "u1", 1),
            ("d2", "kg:mentions", "ghost", 1),
            ("d3", "kg:mentions", "ghost", 2),
        ],
        TRIPLE_SCHEMA,
    )
    out = integrity.dangling_refs(t).collect()
    assert [(r.obj, r.n_refs) for r in out] == [("ghost", 2)]


def _bucket(host: str) -> int:
    return int(hashlib.md5(host.encode()).hexdigest()[:4], 16) % 100


def test_host_split_is_host_pure(spark):
    pages = spark.createDataFrame(
        [(f"https://h{i % 7}.example/p/{i}",) for i in range(40)], "url string"
    )
    rows = host_split(pages).collect()
    assert len(rows) == 7 and sum(r.n_pages for r in rows) == 40
    for r in rows:
        b = _bucket(r.host)
        assert r.bucket == b
        assert r.split == ("train" if b < 80 else "valid" if b < 90 else "test")
    # custom percents move the boundaries, same hash
    strict = {r.host: r.split for r in host_split(pages, train_pct=1, valid_pct=0).collect()}
    assert all(s == ("train" if _bucket(h) < 1 else "test") for h, s in strict.items())
    with pytest.raises(ValueError):
        host_split(pages, train_pct=95, valid_pct=10)


def test_count_of_counts_good_turing(spark):
    docs = spark.createDataFrame([(0, "a a a b b c")], "doc_id long, text string")
    rows = {r.r: r for r in textstats.count_of_counts(docs).collect()}
    assert {(r.r, r.n_r) for r in rows.values()} == {(1, 1), (2, 1), (3, 1)}
    assert rows[1].r_star_q == 2000  # (1+1)*n_2*1000 // n_1
    assert rows[2].r_star_q == 3000
    assert rows[3].r_star_q is None  # no n_4: adjustment undefined


def test_vocab_growth_curve(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "b d"), (3, "")], "doc_id long, text string"
    )
    rows = sorted(textstats.vocab_growth(docs, bucket_docs=2).collect(), key=lambda r: r.bucket)
    assert [(r.bucket, r.n_tokens, r.new_types, r.cum_types, r.cum_tokens) for r in rows] == [
        (0, 4, 3, 3, 4),
        (1, 2, 1, 4, 6),
    ]
