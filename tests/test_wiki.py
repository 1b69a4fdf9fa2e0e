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
