"""Pure-function unit tests for the deterministic text core (the same layer
the reference covers with chunker/normalizer unit tests, SURVEY.md §5.1)."""

from vanna_financial_knowledge_graph_spark.functions import textops as T


# --- extract_text ----------------------------------------------------------


def test_extract_headers_and_paragraphs():
    html = b"<html><body><h1>Top</h1><p>Hello world</p><h2>Sub  Title</h2><p>More text</p></body></html>"
    out = T.extract_text(html)
    assert "# Top" in out
    assert "## Sub Title" in out
    assert "Hello world" in out


def test_extract_strips_script_style_comments():
    html = b"<body><script>var x=1;</script><style>p{}</style><!-- hidden --><p>Keep</p></body>"
    out = T.extract_text(html)
    assert "var x" not in out and "hidden" not in out and "Keep" in out


def test_extract_table_verbatim():
    html = b"<body><p>before</p><table><tr><td>A</td></tr></table><p>after</p></body>"
    out = T.extract_text(html)
    assert "<table><tr><td>A</td></tr></table>" in out


def test_extract_crlf_normalized():
    a = T.extract_text(b"<p>one</p>\r\n<p>two</p>")
    b = T.extract_text(b"<p>one</p>\n<p>two</p>")
    assert a == b and "\r" not in a


def test_extract_entities_unescaped():
    assert "Crédit & Co" in T.extract_text("<p>Cr&eacute;dit &amp; Co</p>".encode())


def test_extract_total_on_garbage():
    assert T.extract_text(None) == ""
    assert T.extract_text(b"") == ""
    assert isinstance(T.extract_text(b"\xff\xfe<p>x</p>"), str)


# --- chunk_text (reference semantics: markdown.py:36-242) -------------------

PARA = "This paragraph is definitely long enough to pass the filter."


def test_chunk_breadcrumbs():
    text = "# A\n\n" + PARA + "\n\n## B\n\n" + PARA + "\n\n# C\n\n" + PARA
    chunks = T.chunk_text(text)
    assert [c["header_path"] for c in chunks] == ["A", "A > B", "C"]
    assert [c["position"] for c in chunks] == [0, 1, 2]


def test_chunk_preamble_empty_header_path():
    chunks = T.chunk_text(PARA + "\n\n# A\n\n" + PARA)
    assert chunks[0]["header_path"] == ""


def test_chunk_min_chars_filter():
    chunks = T.chunk_text("# A\n\nok.\n\n# B\n\n" + PARA)
    assert len(chunks) == 1 and chunks[0]["header_path"] == "B"


def test_chunk_even_split_counts():
    # 12 paragraphs, max 5 -> ceil(12/5)=3 chunks of 4/4/4 (reference math,
    # markdown.py:148-189)
    paras = [f"{PARA} num {i}" for i in range(12)]
    text = "# H\n\n" + "\n\n".join(paras)
    chunks = T.chunk_text(text, max_paragraphs=5)
    sizes = [c["content"].count("num") for c in chunks]
    assert sizes == [4, 4, 4]


def test_chunk_even_split_remainder():
    # 13 paragraphs, max 6 -> ceil(13/6)=3 chunks sized 5,4,4
    paras = [f"{PARA} num {i}" for i in range(13)]
    chunks = T.chunk_text("# H\n\n" + "\n\n".join(paras), max_paragraphs=6)
    assert [c["content"].count("num") for c in chunks] == [5, 4, 4]


def test_chunk_atomic_table_and_fence():
    tbl = "<table><tr>\n\n<td>X</td>\n\n</tr></table>"
    fence = "```\ncode line\n\nmore\n```"
    text = "# H\n\n" + tbl + "\n\n" + fence
    paras = T.split_paragraphs(text.split("\n", 2)[2])
    assert tbl in paras and fence in paras
    # blank lines inside atomics don't split them
    assert len([p for p in paras if "<table>" in p]) == 1


def test_chunk_ids_deterministic():
    assert T.chunk_id("abc", 7) == "abc_chunk_0007"
    assert T.doc_uuid("http://x") == T.doc_uuid("http://x")
    assert T.chunk_uuid("u", 1) != T.chunk_uuid("u", 2)


# --- normalizers (utils/text.py semantics) ----------------------------------


def test_normalize_relationship_type():
    f = T.normalize_relationship_type
    assert f("acquired a majority stake in") == "ACQUIRED_A_MAJORITY_STAKE_IN"
    assert f("partnered (closely) with") == "PARTNERED_WITH"
    assert f("!!!") == "RELATED_TO"
    assert f("") == "RELATED_TO"
    # 8-word cap
    assert f("one two three four five six seven eight nine") == (
        "ONE_TWO_THREE_FOUR_FIVE_SIX_SEVEN_EIGHT"
    )


def test_clean_entity_name():
    assert T.clean_entity_name("Apple (the company)  Inc.") == "Apple Inc."
    assert T.clean_entity_name("  A   B ") == "A B"


def test_strip_corp_suffix():
    assert T.strip_corp_suffix("apple inc.") == "apple"
    assert T.strip_corp_suffix("goldman sachs group") == "goldman sachs"
    assert T.strip_corp_suffix("inc") == "inc"  # never empties


def test_date_context_fallback():
    assert T.date_context("Revenue rose in Q3 2024.", "2025-01-01") == "Q3 2024"
    assert (
        T.date_context("Revenue rose sharply.", "2025-01-01")
        == "Document date: 2025-01-01"
    )
    assert T.date_context("Back in 1999 things differed.", "x") == "1999"
