"""Text-analysis operator tests against hand-computed expectations."""

import pytest

from vanna_financial_knowledge_graph_spark.operators import textstats as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog ran to the park and back"),
        (2, "el perro y el gato de la casa que ladra los dias"),
        (3, "12345 67890 !!!"),
        (4, "word"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in X.token_counts(docs).collect()}
    assert got[1]["ws_tokens"] == 11
    assert got[4]["ws_tokens"] == 1
    assert got[1]["n_chars"] == len("the cat and the dog ran to the park and back")
    assert got[1]["approx_bpe_tokens"] == got[1]["n_chars"] // 4


def test_language_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in X.language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_quality_scores(docs):
    got = {r["doc_id"]: r for r in X.quality_scores(docs).collect()}
    assert got[1]["keep"] == 1
    assert got[3]["keep"] == 0  # too few words, digit-heavy
    assert got[3]["digit_ratio"] > 0.5
    assert 0 <= got[1]["stop_ratio"] <= 1
    # hand check: 'the' x3 + 'and' x2 + 'to' x1 = 6 stopword hits / 11 words
    assert got[1]["stop_ratio"] == pytest.approx(round(6 / 11, 4))


def test_fingerprints_ws_invariant(spark):
    docs = spark.createDataFrame(
        [(1, "A  B\tC"), (2, "a b c"), (3, "different")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in X.doc_fingerprints(docs).collect()}
    assert got[1] == got[2] != got[3]


def test_documents_text_is_ascii():
    """The simhash_verified oracle reproduces FNV-1a64 in SQL by hashing
    ord(c) per character while the Spark operator hashes UTF-8 bytes, and
    DuckDB '\\s+' tokenization differs from str.split() on exotic Unicode
    whitespace — parity therefore NEEDS a pure-ASCII corpus (ADVICE r4).
    Pin that generator property at every shipped scale factor so a future
    non-ASCII document fails HERE with a clear message, not as a confusing
    oracle value mismatch."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        (n_bad,) = duckdb.sql(
            "SELECT count(*) FROM read_parquet(?) "
            "WHERE regexp_matches(text, '[^\\x00-\\x7F]')",
            params=[path],
        ).fetchone()
        assert n_bad == 0, (
            f"{sf}: {n_bad} non-ASCII documents — simhash_verified oracle "
            "parity no longer holds; hash encode(tok) bytes in the SQL"
        )
