"""Wiki sidecar store + joins (reference: ``instant/wikipedia/``).

The reference keeps Wikipedia/Wikiquote/Wikidata/Wiktionary rows in
PostgreSQL and serves an item via a 4-way join
(``postgresql.go:189-218``): wikipedia LEFT JOIN wikiquote ON id LEFT
JOIN wikidata ON id FULL OUTER JOIN wiktionary ON lower(title); claims
are enriched by a LATERAL explode + dimension join
(``postgresql.go:160-185, 552-614``); disambiguation pages fan out
through outgoing links prefixed ``<title>_`` ordered by popularity
(``postgresql.go:237-291``).

Spark re-expression (SURVEY.md §2.3 J3-J5): the same joins as
DataFrame ops. The wikipedia side is the large table; wikidata /
wiktionary / the title probe-list are broadcastable dimensions at
serving time, while a full batch enrichment co-partitions on ``id``
(one shuffle each side, no skew — ids are unique).

``synth_wiki_tables`` derives deterministic sidecar tables from the
``documents`` testdata table so every join has an exact DuckDB oracle
(no external data).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import analyze

DISAMBIG = "Wikipedia disambiguation page"


@dataclass
class WikiTables:
    wikipedia: DataFrame   # id, title, text, outgoing_link, popularity_score
    wikiquote: DataFrame   # id, quotes (array)
    wikidata: DataFrame    # id, label, description, claims (array of ids)
    wiktionary: DataFrame  # title, definition


def synth_wiki_tables(docs: DataFrame) -> WikiTables:
    """Deterministic sidecar tables derived from documents(doc_id,
    text, n_chars). Shapes mirror postgresql.go:375-400 (text[] links,
    jsonb claims → array columns); every rule is plain SQL so DuckDB
    can reproduce it byte-for-byte."""
    n_total = docs.count()
    toks = docs.select(
        "doc_id", "n_chars", analyze.tokens(F.col("text")).alias("tk"),
        F.col("text"))
    base = toks.where(F.size("tk") >= 5)
    tk = F.col("tk")
    # disambiguation pages (doc_id%5==0, flagged in wikidata) carry a
    # single-token title so their outgoing links (<tok0>_<tokN>) have
    # the reference's "<title>_..." prefix shape and resolve against
    # two-token titles of regular pages
    wikipedia = base.select(
        F.concat(F.lit("Q"), F.col("doc_id")).alias("id"),
        F.when(F.col("doc_id") % 5 == 0, tk[0])
         .otherwise(F.concat_ws(" ", tk[0], tk[1])).alias("title"),
        F.col("text"),
        F.array(F.concat(tk[0], F.lit("_"), tk[2]),
                F.concat(tk[0], F.lit("_"), tk[3]),
                F.concat(tk[1], F.lit("_"), tk[4])).alias("outgoing_link"),
        F.col("n_chars").cast("double").alias("popularity_score"),
        F.col("doc_id"))
    wikiquote = (base.where(F.col("doc_id") % 2 == 0)
                 .select(F.concat(F.lit("Q"), F.col("doc_id")).alias("id"),
                         F.array(F.concat_ws(" ", tk[0], tk[1], tk[2]),
                                 F.concat_ws(" ", tk[3], tk[4])).alias("quotes")))
    wikidata = base.select(
        F.concat(F.lit("Q"), F.col("doc_id")).alias("id"),
        tk[1].alias("label"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(DISAMBIG))
         .otherwise(tk[2]).alias("description"),
        F.array(F.concat(F.lit("Q"), (F.col("doc_id") + 13) % n_total),
                F.concat(F.lit("Q"), (F.col("doc_id") + 29) % n_total))
         .alias("claims"))
    wiktionary = (base.where(F.col("doc_id") % 3 == 0)
                  .select(F.concat_ws(" ", tk[0], tk[1]).alias("title"),
                          F.concat(F.lit("def of "), tk[1]).alias("definition")))
    return WikiTables(wikipedia, wikiquote, wikidata, wiktionary)


def synth_wiki_sql(sql_toks: str) -> dict[str, str]:
    """DuckDB CTEs reproducing synth_wiki_tables exactly (tk is
    1-indexed in DuckDB)."""
    return {
        "wbase": f"""
wtoks AS (SELECT t.doc_id, d.n_chars, t.tk, d.text
          FROM ({sql_toks}) t JOIN documents d USING (doc_id)),
wbase AS (SELECT * FROM wtoks WHERE len(tk) >= 5),
wn AS (SELECT count(*) AS n FROM documents),
wikipedia AS (
  SELECT 'Q' || doc_id AS id,
         CASE WHEN doc_id % 5 = 0 THEN tk[1]
              ELSE tk[1] || ' ' || tk[2] END AS title, text,
         [tk[1] || '_' || tk[3], tk[1] || '_' || tk[4],
          tk[2] || '_' || tk[5]] AS outgoing_link,
         CAST(n_chars AS DOUBLE) AS popularity_score, doc_id
  FROM wbase),
wikiquote AS (
  SELECT 'Q' || doc_id AS id,
         [tk[1] || ' ' || tk[2] || ' ' || tk[3],
          tk[4] || ' ' || tk[5]] AS quotes
  FROM wbase WHERE doc_id % 2 = 0),
wikidata AS (
  SELECT 'Q' || doc_id AS id, tk[2] AS label,
         CASE WHEN doc_id % 5 = 0 THEN '{DISAMBIG}' ELSE tk[3] END AS description,
         ['Q' || ((doc_id + 13) % (SELECT n FROM wn)),
          'Q' || ((doc_id + 29) % (SELECT n FROM wn))] AS claims
  FROM wbase),
wiktionary AS (
  SELECT tk[1] || ' ' || tk[2] AS title, 'def of ' || tk[2] AS definition
  FROM wbase WHERE doc_id % 3 = 0)""",
    }


def item_join(t: WikiTables, titles: DataFrame | None = None) -> DataFrame:
    """J3 — the reference's 4-way item lookup (postgresql.go:189-218)
    as a batch join: wikipedia LEFT JOIN wikiquote ON id LEFT JOIN
    wikidata ON id FULL OUTER JOIN wiktionary ON lower(title).

    ``titles`` (optional, broadcast) restricts to a probe set — the
    serving path; omitted = full enrichment (the batch path).
    Returns flat scalars so results hash stably.
    """
    w = t.wikipedia
    if titles is not None:
        w = w.join(F.broadcast(titles.select(
            F.lower(F.col("title")).alias("__probe"))),
            F.lower(w["title"]) == F.col("__probe"), "left_semi")
    out = (w.join(t.wikiquote, "id", "left")
           .join(t.wikidata, "id", "left")
           .join(t.wiktionary.withColumnRenamed("title", "wktitle"),
                 F.lower(w["title"]) == F.lower(F.col("wktitle")), "full_outer"))
    return out.select(
        F.coalesce(F.col("id"), F.lit("")).alias("id"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.size(F.coalesce(F.col("outgoing_link"),
                          F.array().cast("array<string>"))).alias("n_links"),
        F.size(F.coalesce(F.col("quotes"),
                          F.array().cast("array<string>"))).alias("n_quotes"),
        F.coalesce(F.col("label"), F.lit("")).alias("label"),
        F.coalesce(F.col("wktitle"), F.lit("")).alias("wktitle"),
        F.coalesce(F.col("definition"), F.lit("")).alias("definition"),
        F.coalesce(F.col("popularity_score"), F.lit(0.0)).alias("popularity_score"),
    )


def claims_join(t: WikiTables) -> DataFrame:
    """J4 — claims enrichment (postgresql.go:172-185 LATERAL
    jsonb_array_elements + build_item's LEFT JOIN wikidata on entity
    id, :552-614): explode the claims array, join each entity id back
    to its label. The dimension side is the full wikidata table —
    co-partitioned equi-join on id (unique keys ⇒ no skew)."""
    exploded = (t.wikidata.select(
        "id", F.explode("claims").alias("claim_id")))
    dim = t.wikidata.select(F.col("id").alias("claim_id"),
                            F.col("label").alias("claim_label"))
    return (exploded.join(dim, "claim_id", "left")
            .select("id", "claim_id",
                    F.coalesce("claim_label", F.lit("")).alias("claim_label")))


def disambiguation(t: WikiTables, k: int = 10) -> DataFrame:
    """J5 — disambiguation fan-out (postgresql.go:237-291): for pages
    whose wikidata description marks them as disambiguation, follow
    outgoing links prefixed ``lower(title)+'_'`` (spaces→underscores),
    resolve each link (underscores→spaces, lowercased) against
    wikipedia titles, keep top-``k`` by popularity per source page.

    Window row_number per source page — the per-page ORDER BY
    popularity DESC LIMIT 10 of the reference, batched."""
    dis_pages = (t.wikipedia.join(t.wikidata, "id")
                 .where(F.col("description") == DISAMBIG)
                 .select(F.col("id").alias("src_id"), F.col("title"),
                         "outgoing_link"))
    lc = F.lower(F.regexp_replace(F.col("title"), " ", "_"))
    links = (dis_pages
             .select("src_id", lc.alias("lc"),
                     F.explode("outgoing_link").alias("link"))
             .where(F.lower(F.col("link")).startswith(
                 F.concat(F.col("lc"), F.lit("_"))))
             .select("src_id",
                     F.lower(F.regexp_replace("link", "_", " ")).alias("target")))
    targets = t.wikipedia.select(
        F.lower(F.col("title")).alias("target"),
        F.col("id").alias("target_id"), F.col("title").alias("target_title"),
        "popularity_score")
    hits = links.join(targets, "target")
    w = Window.partitionBy("src_id").orderBy(
        F.desc("popularity_score"), F.asc("target_id"))
    return (hits.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("src_id", "target_id", "target_title",
                    "popularity_score", "rk"))


# ---------------------------------------------------------------------------
# S5 — cirrus / wikidata dump scan (dump.go:107-205)
# ---------------------------------------------------------------------------

#: per-type row schemas, mirroring the reference's unmarshal targets
#: (wikipedia.go:27-34, wikiquote.go:14-19, wiktionary.go:12-19,
#: wikidata.go:11-16 labels/aliases/descriptions; the claims P-code
#: projection of wikidata.go:146-168 is modeled by synth_wiki_tables'
#: claims array downstream).
CIRRUS_SCHEMAS = {
    "wikipedia": ("wikibase_item string, language string, "
                  "outgoing_link array<string>, popularity_score double, "
                  "title string, text string"),
    "wikiquote": ("wikibase_item string, language string, "
                  "source_text string, quotes array<string>"),
    "wiktionary": ("title string, language string, source_text string, "
                   "definitions array<struct<part:string, meaning:string, "
                   "synonyms:array<string>>>"),
    "wikidata": ("id string, "
                 "labels map<string, struct<language:string, value:string>>, "
                 "aliases map<string, array<struct<language:string, value:string>>>, "
                 "descriptions map<string, struct<language:string, value:string>>"),
}


def read_cirrus_dump(spark, path: str, kind: str = "wikipedia",
                     truncate: int = -1) -> DataFrame:
    """Line-delimited cirrus/wikidata dump scan as a DataFrame plan.

    The reference scans one file sequentially (dump.go:107-205); here
    ``spark.read.text`` handles `.gz`/`.bz2` natively (one task per
    compressed file — the same per-file boundary) and the line
    semantics are declarative, so a directory of dump files fans out
    across executors:

    - strip ONE trailing comma (wikidata array format, dump.go:144)
    - drop ``[`` / ``]`` wrapper lines (dump.go:145-147)
    - drop ``{"index":{...}}`` action lines (dump.go:151-165)
    - ``from_json`` with the per-type schema (malformed lines → null
      columns rather than aborting the scan)
    - wikipedia text runs the reference cleanup chain (strip
      parentheticals, drop NBSP, word-preserving truncate;
      wikipedia.go:41-64) via ``functions.wiki_clean_text``

    Real dumps contain duplicate ids and rows without a
    ``wikibase_item`` (dump.go:174-176 note) — callers filter/dedup,
    e.g. ``.where("id <> ''").dropDuplicates(["id"])``.
    """
    from .functions import wiki_clean_text

    schema = CIRRUS_SCHEMAS[kind]
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    lines = lines.select(
        F.when(F.col("line").endswith(","),
               F.expr("substring(line, 1, length(line) - 1)"))
        .otherwise(F.col("line")).alias("line"))
    lines = lines.where((F.length("line") > 0)
                        & ~F.col("line").isin("[", "]")
                        & F.get_json_object("line", "$.index._id").isNull())
    parsed = (lines.select(F.from_json("line", schema).alias("doc"))
              .select("doc.*"))
    if kind in ("wikipedia", "wikiquote"):
        parsed = parsed.withColumnRenamed("wikibase_item", "id")
    if kind == "wikipedia":
        parsed = parsed.withColumn(
            "text", wiki_clean_text(F.col("text"), truncate))
    return parsed


# ---------------------------------------------------------------------------
# S6 — dump-link discovery (dump.go:207-209, 216-305)
# ---------------------------------------------------------------------------

#: filename shapes of cirrus content dumps (dump.go:207-209)
#: (dots escaped — the reference's own patterns leave them as
#: match-any, which is a latent bug, not a semantic to preserve)
_CIRRUS_RE = {
    "wikipedia": r"^([a-z_]+)wiki-\d{8}-cirrussearch-content\.json\.gz$",
    "wikiquote": r"^([a-z_]+)wikiquote-\d{8}-cirrussearch-content\.json\.gz$",
    "wiktionary": r"^([a-z_]+)wiktionary-\d{8}-cirrussearch-content\.json\.gz$",
}

#: project prefixes that look like language codes but aren't wikis we
#: ever ingest (dump.go:285-291)
_SKIP_PREFIXES = {
    "advisory", "be_x_old", "commons", "donate", "fixcopyright",
    "foundation", "incubator", "labs", "labtest", "login", "mediawiki",
    "meta", "nostalgia", "outreach", "quality", "species", "simple",
    "sources", "strategy", "test", "testwikidata", "usability", "vote",
    "wikidata", "atj", "eml", "roa_tara", "ten", "zh_classical",
    "wikimania",
}


def discover_cirrus_files(html_index: str,
                          file_types=("wikipedia", "wikiquote", "wiktionary"),
                          supported: set[str] | None = None) -> list[dict]:
    """Classify dump-index ``<a href>`` entries into ingestable files.

    The reference scrapes dumps.wikimedia.org's directory page and
    regex-matches filenames, skipping non-language project prefixes and
    unsupported languages (dump.go:216-305). Driver-side pure Python —
    the listing is one small page; the resulting file list is what
    ``read_cirrus_dump`` fans out over executors. No network here:
    callers pass the fetched page (or a fixture).

    Returns dicts ``{href, type, lang}``; ``lang`` is the filename
    prefix with ``_`` → ``-`` (BCP-47-ish, e.g. ``zh_min_nan`` →
    ``zh-min-nan``).
    """
    import re
    from html.parser import HTMLParser

    hrefs: list[str] = []

    class _A(HTMLParser):
        def handle_starttag(self, tag, attrs):
            if tag == "a":
                for k, v in attrs:
                    if k == "href" and v:
                        hrefs.append(v)

    _A().feed(html_index)

    out = []
    for href in hrefs:
        base = href.rsplit("/", 1)[-1]
        for ft in file_types:
            m = re.match(_CIRRUS_RE[ft], base)
            if not m:
                continue
            prefix = m.group(1)
            if prefix in _SKIP_PREFIXES:
                continue
            lang = prefix.replace("_", "-")
            if supported is not None and lang not in supported:
                continue
            out.append({"href": href, "type": ft, "lang": lang})
    return out
