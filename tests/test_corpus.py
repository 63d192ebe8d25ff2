"""ner-corpus / topic-corpus analogues (SURVEY.md §2.3)."""

from pignlproc_spark.operators import corpus


def test_opennlp_render_basic():
    s = "Alpha beta met Gamma delta."
    spans = [
        {"begin": 0, "end": 10, "type": "Person"},
        {"begin": 15, "end": 26, "type": "Place"},
    ]
    out = corpus.opennlp_render(s, spans)
    assert out == "<START:Person> Alpha beta <END> met <START:Place> Gamma delta <END>."


def test_opennlp_render_overlap_drops_later():
    s = "Alpha beta gamma"
    spans = [
        {"begin": 0, "end": 10, "type": "A"},
        {"begin": 6, "end": 16, "type": "B"},  # overlaps the first
    ]
    out = corpus.opennlp_render(s, spans)
    assert out == "<START:A> Alpha beta <END> gamma"


def test_ner_training_sentences(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", 0, "Alpha beta met Gamma.", 0, 10, "Alpha beta", "uriA"),
            ("u1", 0, "Alpha beta met Gamma.", 15, 20, "Gamma", "uriG"),
            ("u1", 1, "No typed target here.", 0, 2, "No", "uriX"),
        ],
        "url string, ctx_idx int, context string, begin int, end int, surface_form string, uri string",
    )
    types = spark.createDataFrame([("uriA", "Person"), ("uriG", "Place")], "uri string, type string")
    rows = {(r.url, r.ctx_idx): r.annotated for r in corpus.ner_training_sentences(mentions, types).collect()}
    assert rows == {
        ("u1", 0): "<START:Person> Alpha beta <END> met <START:Place> Gamma <END>."
    }  # untyped sentence drops (inner join, FLATTEN semantics)


def test_grounded_and_closure(spark):
    cats = spark.createDataFrame(
        [("u%d" % i, "CatA" if i < 4 else "CatB") for i in range(6)], "uri string, category string"
    )
    g = {r.category: r.n_articles for r in corpus.grounded_topics(cats, min_articles=3).collect()}
    assert g == {"CatA": 4}

    broader = spark.createDataFrame(
        [("c1", "c0"), ("c2", "c1"), ("x", "y"), ("y", "x")], "category string, parent string"
    )
    roots = {r.category: r.root for r in corpus.broader_closure(broader).collect()}
    assert roots["c2"] == "c0" and roots["c1"] == "c0"
    assert roots["x"] in {"x", "y"}  # cycle: bounded, deterministic


def test_topic_abstract_corpus(spark):
    cats = spark.createDataFrame(
        [("u%d" % i, "CatA") for i in range(3)] + [("u9", "CatB")], "uri string, category string"
    )
    abstracts = spark.createDataFrame(
        [("u%d" % i, "abs %d" % i) for i in range(3)], "uri string, abstract string"
    )
    rows = corpus.topic_abstract_corpus(cats, abstracts, min_articles=3).collect()
    assert {(r.category, r.uri) for r in rows} == {("CatA", "u0"), ("CatA", "u1"), ("CatA", "u2")}
