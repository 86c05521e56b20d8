"""Synthetic Common-Crawl-style pages source.

`synthesize_pages` deterministically derives a pages table
(url, warc_ts, html, text, lang) — the exact input shape from BASELINE.json
`input_hint` — from the driver's `documents` parquet. Generation happens
*inside executors* (mapInPandas) so it scales like any other stage: no
driver-side loops, no collected data, seeded per doc_id so the output is
byte-stable across runs, partition counts, and parallelism levels.

The generated HTML exercises every extraction edge case from FIXTURES.md §1:
h1-h3 section headers, multi-paragraph sections beyond the 6-paragraph split
threshold, atomic <table> blocks and ``` code fences, sub-50-char fragments,
entities/aliases drawn from the gazetteer with hot-skew injection (AAPL in
~30% of pages, SEC/Fed similarly — the salted-join stress case), plus
non-ASCII names and CRLF newlines on a deterministic subset.
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

import pandas as pd

from ..functions.textops import extract_text
from ..gazetteer import ontology_rows, registry_rows

GROUP_ID = "default"

_SENTENCE_TEMPLATES = [
    "{subj} announced a partnership with {obj} in {period}.",
    "{subj} acquired {obj} for an undisclosed sum in {period}.",
    "{subj} reported stronger earnings than {obj} in {period}.",
    "{subj} raised its full-year guidance, and {obj} followed in {period}.",
    "{subj} filed a complaint against {obj} in {period}.",
    "{subj} invested heavily in {obj} during {period}.",
    "{subj} launched a new product to compete with {obj} in {period}.",
    "{subj} appointed a new executive poached from {obj} in {period}.",
    "{subj} signed a long-term supply agreement with {obj} in {period}.",
    "{subj} warned that tariffs could hurt {obj} in {period}.",
    "{subj} expanded operations in {obj} during {period}.",
    "{subj} posted record revenue, surpassing {obj}, in {period}.",
]

_TOPIC_TEMPLATES = [
    "{subj} reported rising concern about {topic} in {period}.",
    "{subj} cut spending in response to {topic} during {period}.",
    "{subj} increased hiring despite {topic} in {period}.",
    "Analysts said {subj} boosted its outlook on {topic} in {period}.",
]

_FILLER = [
    "Contacts across the district described conditions as mixed.",
    "Several respondents noted that activity was little changed on balance.",
    "Looking ahead, expectations for the coming months remained cautious.",
    "A manufacturer based in Hawaii reported steady orders.",
    "Sources familiar with the matter declined to comment further.",
    "Overall sentiment improved modestly relative to the prior period.",
]

_PERIODS = [
    "Q1 2025", "Q2 2025", "Q3 2025", "Q4 2024", "January 2025",
    "March 2025", "June 2025", "September 2025", "fiscal year 2025",
    "early 2025", "recent weeks",
]

_SECTION_TITLES = [
    "Overall Economic Activity", "Labor Markets", "Prices",
    "Consumer Spending", "Manufacturing", "Real Estate and Construction",
    "Financial Services", "Technology Sector", "Energy", "Agriculture",
    "Outlook", "Market Commentary",
]

# module-level caches (built once per worker process)
_REG = registry_rows()
_ONT = ontology_rows()
_HOT = ["Apple Inc.", "Securities and Exchange Commission", "Federal Reserve"]


def _surfaces(r: dict) -> list[str]:
    return [r["canonical_name"], *r["aliases"]] + ([r["ticker"]] if r["ticker"] else [])


def _page_html(doc_id: int, doc_text: str, rng: random.Random) -> str:
    ent_pool = _REG
    parts: list[str] = [f"<html><head><title>Report {doc_id}</title>",
                        "<script>var x=1;</script><style>p{color:#000}</style></head><body>"]
    parts.append(f"<h1>Market Report {doc_id}</h1>")
    n_sections = rng.randint(2, 4)
    words = doc_text.split()
    for s in range(n_sections):
        title = rng.choice(_SECTION_TITLES)
        parts.append(f"<h2>{title}</h2>")
        if rng.random() < 0.35:
            parts.append(f"<h3>{rng.choice(['Summary', 'Details', 'Contacts'])}</h3>")
        n_paras = rng.randint(2, 9)  # >6 exercises the even-split path
        for _ in range(n_paras):
            sents: list[str] = []
            for _ in range(rng.randint(1, 3)):
                roll = rng.random()
                if roll < 0.55:
                    tmpl = rng.choice(_SENTENCE_TEMPLATES)
                    subj = rng.choice(_HOT) if rng.random() < 0.30 else rng.choice(ent_pool)["canonical_name"]
                    if not isinstance(subj, str):
                        subj = subj["canonical_name"]
                    obj_r = rng.choice(ent_pool)
                    obj = rng.choice(_surfaces(obj_r))
                    if obj == subj:
                        obj = rng.choice(ent_pool)["canonical_name"]
                    sents.append(tmpl.format(subj=subj, obj=obj, period=rng.choice(_PERIODS)))
                elif roll < 0.75:
                    tmpl = rng.choice(_TOPIC_TEMPLATES)
                    subj = rng.choice(_HOT) if rng.random() < 0.30 else rng.choice(ent_pool)["canonical_name"]
                    t = rng.choice(_ONT)
                    topic = rng.choice([t["label"], *t["synonyms"]])
                    sents.append(tmpl.format(subj=subj, topic=topic, period=rng.choice(_PERIODS)))
                else:
                    sents.append(rng.choice(_FILLER))
            # weave in a slice of the driver-document text as plain filler
            if words and rng.random() < 0.3:
                lo = rng.randrange(0, max(1, len(words) - 12))
                sents.append(" ".join(words[lo : lo + 12]) + ".")
            parts.append("<p>" + " ".join(sents) + "</p>")
        if rng.random() < 0.25:
            parts.append(
                "<table><tr><th>Metric</th><th>Value</th></tr>"
                f"<tr><td>Index</td><td>{rng.randint(90, 110)}</td></tr>"
                f"<tr><td>Change</td><td>{rng.randint(-5, 5)}%</td></tr></table>"
            )
        if rng.random() < 0.10:
            parts.append(f"<p>```\nseries_{doc_id} = [{rng.randint(1, 9)}, {rng.randint(1, 9)}]\n```</p>")
        if rng.random() < 0.15:
            parts.append("<p>ok.</p>")  # sub-50-char chunk, must be filtered
    if rng.random() < 0.1:
        parts.append("<p>Crédit Agricole reported improved margins — naïve estimates aside.</p>")
    parts.append("</body></html>")
    html = "\n".join(parts)
    if doc_id % 17 == 0:
        html = html.replace("\n", "\r\n")  # CRLF normalization case
    return html


def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    epoch = _dt.datetime(2025, 6, 1, tzinfo=_dt.timezone.utc)
    for pdf in batches:
        rows = []
        for doc_id, text, lang, source, rep in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"], pdf["rep"]
        ):
            # per-(doc, replica) seed: output identical at any partitioning
            rng = random.Random(9973 * int(doc_id) + 7919 * int(rep) + 42)
            html = _page_html(int(doc_id), str(text), rng)
            hb = html.encode("utf-8")
            suffix = f"/r{int(rep)}" if int(rep) else ""
            rows.append(
                {
                    "url": f"https://news.example.com/{source}/{int(doc_id)}{suffix}",
                    "warc_ts": epoch + _dt.timedelta(minutes=int(doc_id), seconds=int(rep)),
                    "html": hb,
                    "text": extract_text(hb),
                    "lang": str(lang),
                }
            )
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def dedupe_pages(pages, keep: str = "latest"):
    """Collapse duplicate urls (FIXTURES.md §1 edge case: the same url can
    appear in multiple crawl partitions). keep='latest' retains the row with
    the max warc_ts (ties broken by text to stay deterministic); 'earliest'
    the min.

    Expressed as groupBy(url).max_by/min_by rather than a row_number window:
    a hash aggregate gets map-side partial aggregation, so duplicate urls
    collapse inside each input partition BEFORE the exchange and the shuffle
    carries ~one row per distinct url — a window would shuffle every
    duplicate's full row (html included). Skew-free (url hash keys)."""
    from pyspark.sql import functions as F

    cols = pages.columns
    orderer = F.struct(F.col("warc_ts"), F.col("text"))
    picker = F.max_by if keep == "latest" else F.min_by
    return (
        pages.groupBy("url")
        .agg(picker(F.struct(*cols), orderer).alias("_r"))
        .select("_r.*")
    )


def synthesize_pages(
    spark, sf_dir: str, repartition: int | None = None, replicate: int = 1
):
    """documents.parquet -> pages DataFrame (distributed, deterministic).

    Repartition happens on the *input* (before the generation UDF) so the
    CPU-heavy HTML synthesis parallelizes even when the source is one file;
    per-(doc, replica) seeding keeps output identical at any partitioning.
    `replicate` multiplies the corpus (distinct urls/content per replica) —
    used by the scaling benchmark to size the workload to the core count.
    """
    from pyspark.sql import functions as F

    from ..schemas import PAGES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    docs = docs.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(max(0, replicate - 1))))
    )
    if repartition:
        docs = docs.repartition(repartition, "doc_id", "rep")
    return docs.mapInPandas(_gen, schema=PAGES)
