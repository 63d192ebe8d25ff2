"""Pointer-chasing canonicalization: chains, cycles, dangling targets,
disambiguation fan-out (SURVEY.md §7.2 step 4)."""

from pignlproc_spark.operators.canonicalize import (
    MAX_HOPS,
    apply_redirects,
    expand_disambiguations,
    resolve_mapping,
    resolve_uris,
)


def _red(spark, edges):
    return spark.createDataFrame(edges, "src_uri string, dst_uri string")


def test_chain_resolution(spark):
    red = _red(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    uris = spark.createDataFrame([("a",), ("b",), ("d",), ("zz",)], "uri string")
    got = {r.uri: r.resolved_uri for r in resolve_uris(uris, red).collect()}
    assert got == {"a": "d", "b": "d", "d": "d", "zz": "zz"}


def test_cycle_bounded(spark):
    red = _red(spark, [("x", "y"), ("y", "x")])
    uris = spark.createDataFrame([("x",)], "uri string")
    got = resolve_uris(uris, red).collect()[0].resolved_uri
    # after MAX_HOPS (even) steps from x -> back at x; bounded, no hang
    assert got == "x"
    assert MAX_HOPS % 2 == 0


def test_dangling_target(spark):
    red = _red(spark, [("a", "missing")])
    uris = spark.createDataFrame([("a",)], "uri string")
    assert resolve_uris(uris, red).collect()[0].resolved_uri == "missing"


def test_resolve_mapping_and_apply(spark):
    red = _red(spark, [("a", "b"), ("b", "c")])
    m = {r.src_uri: r.resolved_uri for r in resolve_mapping(red).collect()}
    assert m == {"a": "c", "b": "c"}
    facts = spark.createDataFrame([("a", 1), ("q", 2)], "uri string, v int")
    got = {r.uri: r.v for r in apply_redirects(facts, red, "uri").collect()}
    assert got == {"c": 1, "q": 2}


def test_resolve_mapping_both_paths_identical(spark, monkeypatch):
    """The collect-chase and iterative-join paths must implement the
    SAME frozen semantics (chain, cycle, dangling), and the auto
    switch picks the distributed path past the row threshold without
    changing the result."""
    from pignlproc_spark.operators import canonicalize

    red = _red(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x"), ("q", "gone")],
    )
    collect_path = {
        r.src_uri: r.resolved_uri
        for r in resolve_mapping(red, distributed=False).collect()
    }
    dist_path = {
        r.src_uri: r.resolved_uri
        for r in resolve_mapping(red, distributed=True).collect()
    }
    assert collect_path == dist_path
    assert collect_path["a"] == "d" and collect_path["q"] == "gone"
    assert collect_path["x"] == "x"  # even MAX_HOPS around the 2-cycle
    # auto mode: force the threshold under the row count — result
    # identical through the distributed branch
    monkeypatch.setattr(canonicalize, "AUTO_DISTRIBUTED_ROWS", 2)
    auto = {
        r.src_uri: r.resolved_uri for r in canonicalize.resolve_mapping(red).collect()
    }
    assert auto == collect_path


def test_resolve_mapping_multi_parent_deterministic(spark):
    """A source with several targets (a skos:broader DAG) resolves via
    the lexicographically-smallest parent chain — deterministic and
    IDENTICAL through both code paths (the raw dict-build used to keep
    an arbitrary collect-order winner; the join path fanned out)."""
    red = spark.createDataFrame(
        [("cat", "pa"), ("cat", "pb"), ("pa", "root_a"), ("pb", "root_b")],
        "src_uri string, dst_uri string",
    )
    want = {"cat": "root_a", "pa": "root_a", "pb": "root_b"}
    for dist in (False, True):
        got = {
            r.src_uri: r.resolved_uri
            for r in resolve_mapping(red, distributed=dist).collect()
        }
        assert got == want, f"distributed={dist}"


def test_expand_disambiguations(spark):
    dabs = spark.createDataFrame([("d1", "c1"), ("d1", "c2")], "dab_uri string, candidate_uri string")
    facts = spark.createDataFrame([("d1", 1), ("plain", 2)], "uri string, v int")
    rows = expand_disambiguations(facts, dabs, "uri").collect()
    got = sorted((r.uri, r.v, r.is_dab) for r in rows)
    assert got == [("c1", 1, True), ("c2", 1, True), ("plain", 2, False)]
