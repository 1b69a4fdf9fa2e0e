"""Wiki sidecar joins (J3-J5) vs DuckDB over the same synthesized
tables."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    from jivesearch_spark import wiki
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return wiki.synth_wiki_tables(docs)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * "
              f"FROM read_parquet('{SF}/documents.parquet')")
    return c


def _oracle(con, body):
    import __spark_entry__ as e
    from jivesearch_spark.wiki import synth_wiki_sql
    cte = synth_wiki_sql(e.SQL_TOKS)["wbase"]
    return con.execute(f"WITH {cte} {body}")


def _cmp(sdf, cur):
    scols = sorted(sdf.columns)
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    srows = sorted((tuple(r[c] for c in scols) for r in sdf.collect()), key=key)
    ocols = [d[0] for d in cur.description]
    orows = sorted((tuple(dict(zip(ocols, r))[c] for c in scols)
                    for r in cur.fetchall()), key=key)
    assert len(srows) == len(orows) and srows, (len(srows), len(orows))
    assert srows == orows


@pytest.mark.spark
def test_item_join_matches_duckdb(tables, con):
    from jivesearch_spark import wiki
    _cmp(wiki.item_join(tables), _oracle(con, """
SELECT coalesce(w.id, '') AS id, coalesce(w.title, '') AS title,
       coalesce(len(w.outgoing_link), 0) AS n_links,
       coalesce(len(q.quotes), 0) AS n_quotes,
       coalesce(d.label, '') AS label,
       coalesce(wk.title, '') AS wktitle,
       coalesce(wk.definition, '') AS definition,
       coalesce(w.popularity_score, 0.0) AS popularity_score
FROM wikipedia w
LEFT JOIN wikiquote q ON w.id = q.id
LEFT JOIN wikidata d ON w.id = d.id
FULL OUTER JOIN wiktionary wk ON lower(w.title) = lower(wk.title)"""))


@pytest.mark.spark
def test_item_join_probe_titles(tables, spark):
    from jivesearch_spark import wiki
    one = tables.wikipedia.select("title").limit(1)
    probe_title = one.collect()[0]["title"]
    out = wiki.item_join(tables, titles=one).collect()
    assert out and all(r["title"].lower() == probe_title.lower() or r["title"] == ""
                       for r in out)


@pytest.mark.spark
def test_claims_join_matches_duckdb(tables, con):
    from jivesearch_spark import wiki
    _cmp(wiki.claims_join(tables), _oracle(con, """
SELECT e.id, e.claim_id, coalesce(d2.label, '') AS claim_label
FROM (SELECT id, unnest(claims) AS claim_id FROM wikidata) e
LEFT JOIN (SELECT id AS claim_id, label FROM wikidata) d2 USING (claim_id)"""))


@pytest.mark.spark
def test_disambiguation_matches_duckdb(tables, con):
    from jivesearch_spark import wiki
    _cmp(wiki.disambiguation(tables), _oracle(con, """
, dis AS (
  SELECT w.id AS src_id, lower(replace(w.title, ' ', '_')) AS lc,
         w.outgoing_link
  FROM wikipedia w JOIN wikidata d ON w.id = d.id
  WHERE d.description = 'Wikipedia disambiguation page'),
lnk AS (
  SELECT src_id, lower(replace(link, '_', ' ')) AS target
  FROM (SELECT src_id, lc, unnest(outgoing_link) AS link FROM dis)
  WHERE starts_with(lower(link), lc || '_')),
hits AS (
  SELECT l.src_id, w.id AS target_id, w.title AS target_title,
         w.popularity_score
  FROM lnk l JOIN wikipedia w ON lower(w.title) = l.target)
SELECT * FROM (
  SELECT src_id, target_id, target_title, popularity_score,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY popularity_score DESC, target_id) AS rk
  FROM hits) WHERE rk <= 10"""))


@pytest.mark.spark
def test_read_cirrus_dump(spark, tmp_path):
    """S5 scan semantics (dump.go:107-205): index-action lines and
    array wrapper lines skipped, trailing commas stripped, per-type
    JSON parsed, wikipedia text run through the reference cleanup."""
    import gzip
    import json

    from jivesearch_spark import wiki

    wiki_lines = [
        '{"index":{"_type":"page","_id":"17949905"}}',
        json.dumps({"wikibase_item": "Q42", "language": "en",
                    "title": "Douglas Adams",
                    "text": "Douglas Adams (born 1952) wrote books. "
                            "A very long sentence follows here for cut.",
                    "outgoing_link": ["a", "b"], "popularity_score": 0.5}),
        '{"index":{"_type":"page","_id":"2"}}',
        json.dumps({"wikibase_item": "", "language": "en", "title": "NoItem",
                    "text": "short."}),
    ]
    p = tmp_path / "enwiki-20260101-cirrussearch-content.json.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(wiki_lines) + "\n")

    out = {r.title: r for r in
           wiki.read_cirrus_dump(spark, str(p), "wikipedia",
                                 truncate=60).collect()}
    assert set(out) == {"Douglas Adams", "NoItem"}
    da = out["Douglas Adams"]
    assert da.id == "Q42" and da.outgoing_link == ["a", "b"]
    # parens stripped, NBSP dropped, word-preserving cut + " ..."
    assert "(born 1952)" not in da.text and " " not in da.text
    assert da.text.endswith(" ...") and len(da.text) <= 64
    assert out["NoItem"].text == "short."

    # wikidata array format: [ ... ] wrapper + trailing commas
    wd_lines = ["[",
                json.dumps({"id": "Q1", "labels": {"en": {"language": "en",
                            "value": "universe"}}}) + ",",
                json.dumps({"id": "Q2", "descriptions": {"en": {
                            "language": "en", "value": "planet"}}}) + ",",
                "]"]
    p2 = tmp_path / "latest-all.json.gz"
    with gzip.open(p2, "wt", encoding="utf-8") as f:
        f.write("\n".join(wd_lines) + "\n")
    wd = {r.id: r for r in
          wiki.read_cirrus_dump(spark, str(p2), "wikidata").collect()}
    assert set(wd) == {"Q1", "Q2"}
    assert wd["Q1"].labels["en"].value == "universe"
    assert wd["Q2"].descriptions["en"].value == "planet"


def test_discover_cirrus_files():
    """S6 filename classification (dump.go:207-209, 280-305)."""
    from jivesearch_spark import wiki

    page = """
    <html><body><pre>
    <a href="enwiki-20260101-cirrussearch-content.json.gz">x</a>
    <a href="frwiki-20260101-cirrussearch-content.json.gz">x</a>
    <a href="enwikiquote-20260101-cirrussearch-content.json.gz">x</a>
    <a href="dewiktionary-20260101-cirrussearch-content.json.gz">x</a>
    <a href="zh_min_nanwiki-20260101-cirrussearch-content.json.gz">x</a>
    <a href="commonswiki-20260101-cirrussearch-content.json.gz">x</a>
    <a href="testwikidatawiki-20260101-cirrussearch-content.json.gz">x</a>
    <a href="enwiki-20260101-cirrussearch-general.json.gz">x</a>
    <a href="../somewhere/else.html">x</a>
    </pre></body></html>"""

    files = wiki.discover_cirrus_files(page)
    got = {(f["type"], f["lang"]) for f in files}
    # commons/testwikidata skipped; -general and non-dump hrefs ignored
    assert got == {("wikipedia", "en"), ("wikipedia", "fr"),
                   ("wikipedia", "zh-min-nan"),
                   ("wikiquote", "en"), ("wiktionary", "de")}

    only_en = wiki.discover_cirrus_files(page, supported={"en"})
    assert {(f["type"], f["lang"]) for f in only_en} == {
        ("wikipedia", "en"), ("wikiquote", "en")}
