"""Deterministic synthetic Common-Crawl-style pages corpus.

Generates the input table of BASELINE.json's ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — seeded, partition-order independent (each row's RNG is
derived from (seed, row_id), so the same (n, seed) yields byte-identical
rows at any parallelism), HTML shaped after the reference's own test
bodies (/root/reference/search/document/document_test.go:306-397), with
a Zipfian vocabulary (~30k terms, s≈1.07) for realistic head-term skew.

The golden ``text`` column is computed directly from the raw
ingredients via the pinned field rules (extract_text / dedup /
truncation — NOT by parsing the HTML), so the extractor conformance
test (HTML → text, byte-identical) is a real end-to-end check.
"""

from __future__ import annotations

import datetime as dt
import random
import string

from . import extract, gourl, psl

ZIPF_S = 1.07
VOCAB_SIZE = 30_000

# Anchor words from the reference's own test queries
# (/root/reference/search/elasticsearch_test.go:34, 101-107) pinned at
# known Zipf ranks: head, torso, tail.
ANCHORS = {5: "bob", 17: "dylan", 120: "jimi", 450: "hendrix",
           2000: "stratocaster", 9000: "woodstock", 25000: "telecaster"}

_TLDS = ["com", "org", "net", "co.uk", "de", "fr", "com.br", "io", "jp", "es"]
_SUBS = ["www", "", "api", "blog", "news", "shop"]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en",
          "es", "de", "fr", "pt-BR", "ja"]


def _make_vocab() -> list[str]:
    rng = random.Random(42_000)
    vocab = []
    seen = set()
    while len(vocab) < VOCAB_SIZE:
        n = rng.randint(3, 10)
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    for rank, word in ANCHORS.items():
        vocab[rank] = word
    return vocab


VOCAB = _make_vocab()

# Zipf CDF precomputed once per process for O(log V) sampling.
_WEIGHTS = [1.0 / ((i + 1) ** ZIPF_S) for i in range(VOCAB_SIZE)]
_CDF = []
_acc = 0.0
for _w in _WEIGHTS:
    _acc += _w
    _CDF.append(_acc)
_TOTAL = _acc


def zipf_word(rng: random.Random) -> str:
    import bisect
    x = rng.random() * _TOTAL
    return VOCAB[bisect.bisect_left(_CDF, x)]


def _words(rng: random.Random, lo: int, hi: int) -> list[str]:
    return [zipf_word(rng) for _ in range(rng.randint(lo, hi))]


def _golden_fields(url: str, title_raw: str, keywords_raw: str, desc_raw: str):
    """Apply the pinned per-field rules directly (no HTML parsing);
    returns (canonical_url, fields_dict, text)."""
    title = extract.extract_text(title_raw, extract.TRUNCATE_TITLE)
    words = gourl.remove_duplicates(keywords_raw.replace(",", " ").split())
    if len(words) > extract.TRUNCATE_KEYWORDS:
        words = words[: extract.TRUNCATE_KEYWORDS]
    keywords = extract.extract_text(" ".join(words), -1)
    desc = extract.extract_text(desc_raw, extract.TRUNCATE_DESCRIPTION)
    u = gourl.validate_url(url)
    domain = psl.effective_tld_plus_one(u.host)
    pparts = gourl.path_parts(u.path)
    text = " ".join(p for p in (title, keywords, desc, domain, pparts) if p)
    fields = {"title": title, "keywords": keywords, "description": desc,
              "path_parts": pparts}
    return u.string(), fields, text


#: stub projection's field values (crawler.go:311-322 keeps identity
#: fields only)
_STUB_FIELDS = {"title": "", "keywords": "", "description": "",
                "path_parts": ""}


_HTML_TMPL = """<!DOCTYPE html>
<html lang="{lang}"><head>
<meta charset="{charset}">
<title>{title}</title>
{kw_meta}{desc_meta}{robots_meta}{canon_link}</head>
<body>
{body_links}<p>{body}</p>
<img src="/img/{img}.png" alt="{alt}">
</body></html>"""


def gen_page(i: int, seed: int = 42) -> tuple[str, dt.datetime, bytes, str, str]:
    """One deterministic page row: (url, warc_ts, html, text, lang)."""
    return gen_page_full(i, seed)[:5]


def gen_page_full(i: int, seed: int = 42):
    """gen_page plus the GOLDEN per-field values as a 6th element:
    (url, warc_ts, html, text, lang, fields) with fields =
    {title, keywords, description, path_parts} derived by the pinned
    FIELD rules from the raw ingredients (never by parsing the html),
    so an oracle can check the extractor field-by-field against an
    independent derivation. Stub rows carry all-empty fields (the
    reference's stub projection)."""
    if i < len(_EDGE_ROWS):
        return _EDGE_ROWS[i]()
    rng = random.Random((seed << 32) ^ i)

    sub = rng.choice(_SUBS)
    dom = zipf_word(rng) + rng.choice(["", zipf_word(rng)])
    tld = rng.choice(_TLDS)
    host = (sub + "." if sub else "") + dom + "." + tld
    segs = ["-".join(_words(rng, 1, 3)) for _ in range(rng.randint(0, 3))]
    path = "/" + "/".join(segs) if segs else "/"
    if segs and rng.random() < 0.25:
        path += rng.choice([".html", ".htm", ".php"])
    scheme = "https" if rng.random() < 0.8 else "http"
    url = f"{scheme}://{host}{path}"
    if rng.random() < 0.05:  # exercise ValidateURL lowering/fragments
        url = url.replace("https://", "htTps://").replace("http://", "htTp://")
    if rng.random() < 0.05:
        url += "#frag-" + zipf_word(rng)

    lang = rng.choice(_LANGS)
    title_raw = " ".join(_words(rng, 2, 8))
    if rng.random() < 0.02:
        title_raw = " ".join(_words(rng, 30, 40))  # >100 bytes → truncation
    kw_words = _words(rng, 0, 12)
    kw_words += kw_words[: rng.randint(0, 3)]  # duplicates → dedup path
    if rng.random() < 0.02:
        kw_words = _words(rng, 30, 40)  # >25 words → truncation
    keywords_raw = ", ".join(kw_words)
    desc_raw = " ".join(_words(rng, 5, 30))
    if rng.random() < 0.02:
        desc_raw = " ".join(_words(rng, 60, 80))  # >250 bytes → truncation

    robots = ""
    noindex = False
    r = rng.random()
    if r < 0.02:
        robots = '<meta name="robots" content="noindex, nofollow">\n'
        noindex = True
    elif r < 0.03:
        robots = '<meta name="robots" content="nofollow">\n'
    elif r < 0.05:
        robots = '<meta name="robots" content="all">\n'

    canon = ""
    non_canonical = False
    if rng.random() < 0.04:
        canon = f'<link rel="canonical" href="https://{host}/canonical-{zipf_word(rng)}.php" />\n'
        non_canonical = True

    body_links = "".join(
        f'<a href="https://{host}/{zipf_word(rng)}">{zipf_word(rng)}</a>\n'
        for _ in range(rng.randint(0, 3))
    )
    body = " ".join(_words(rng, 20, 120))

    kw_meta = f'<meta name="keywords" content="{keywords_raw}"/>\n' if kw_words else ""
    desc_meta = f'<meta name="description" content="{desc_raw}">\n' if desc_raw else ""

    html = _HTML_TMPL.format(
        lang=lang, charset="utf-8", title=title_raw, kw_meta=kw_meta,
        desc_meta=desc_meta, robots_meta=robots, canon_link=canon,
        body_links=body_links, body=body, img=zipf_word(rng),
        alt=" ".join(_words(rng, 1, 4)),
    )

    canonical_id, fields, text = _golden_fields(
        url, title_raw, keywords_raw if kw_words else "", desc_raw)
    if noindex or non_canonical:
        text = ""  # stub projection (crawler.go:311-322)
        fields = dict(_STUB_FIELDS)

    ts = dt.datetime(2017, 1, 1) + dt.timedelta(
        seconds=rng.randint(0, 546 * 24 * 3600))
    resolved = extract.match_language(lang)
    return url, ts, html.encode("utf-8"), text, resolved, fields


# ---------------------------------------------------------------------------
# Mandatory edge rows (FIXTURES.md §1) — fixed, handcrafted
# ---------------------------------------------------------------------------

def _edge(url, html_str, text, lang="en", charset="utf-8", ts_day=1,
          fields=None):
    """``fields`` = handcrafted golden per-field values (title,
    keywords, description, path_parts), derived BY HAND from the raw
    ingredients by the pinned FIELD rules — stub rows (empty text)
    default to the all-empty stub projection."""
    f6 = dict(_STUB_FIELDS) if fields is None else {**_STUB_FIELDS, **fields}
    assert fields is not None or text == "", url  # non-stub rows need fields

    def _f():
        return (url, dt.datetime(2017, 6, ts_day),
                html_str.encode(charset), text, lang, f6)
    return _f


def _mk_edges():
    rows = []
    # 1: reference TestNew "uppercase" URL + basic head
    u = "htTp://WWW.eXamplE.cOm/This-Part-Can-Be/UpperCase/or/lowercase?And=a+QuerY"
    rows.append(_edge(
        u,
        '<html lang="en"><head><meta charset="utf-8"><title>The title of a page</title>'
        '<meta name="keywords" content="some keywords for a search engine"/>'
        '<meta name="description" content="A description of the content"></head>'
        "<body><p>body</p></body></html>",
        "The title of a page some keywords for a search engine "
        "A description of the content example.com "
        "This Part Can Be UpperCase or lowercase",
        fields={"title": "The title of a page",
                "keywords": "some keywords for a search engine",
                "description": "A description of the content",
                "path_parts": "This Part Can Be UpperCase or lowercase"}))
    # 2: co.uk eTLD+1 + weird chars (TestNew)
    rows.append(_edge(
        "https://api.example.co.uk/path<s/t#his[/?q=that&p=#that",
        '<html><head><meta charset="utf-8"><title>weird</title></head></html>',
        "weird example.co.uk path<s t",
        fields={"title": "weird", "path_parts": "path<s t"}))
    # 3: fragment stripped
    rows.append(_edge(
        "https://example.com/pagina/#something",
        '<html><head><meta charset="utf-8"><title>pagina page</title></head></html>',
        "pagina page example.com pagina",
        fields={"title": "pagina page", "path_parts": "pagina"}))
    # 4: title > 100 bytes (byte truncation)
    long_title = "aaaa " * 30  # 150 bytes
    rows.append(_edge(
        "https://long.example.com/title.html",
        f'<html><head><meta charset="utf-8"><title>{long_title}</title></head></html>',
        extract.extract_text(long_title, 100) + " example.com title",
        fields={"title": extract.extract_text(long_title, 100),
                "path_parts": "title"}))
    # 5: keywords > 25 words with duplicates
    kws = ", ".join(f"k{i}" for i in range(30)) + ", k0, k1"
    golden_kw = " ".join(f"k{i}" for i in range(25))
    rows.append(_edge(
        "https://kw.example.com/words",
        f'<html><head><meta charset="utf-8"><meta name="keywords" content="{kws}"/></head></html>',
        golden_kw + " example.com words",
        fields={"keywords": golden_kw, "path_parts": "words"}))
    # 6: description > 250 bytes
    desc = "word " * 80
    rows.append(_edge(
        "https://desc.example.com/d",
        f'<html><head><meta charset="utf-8"><meta name="description" content="{desc}"></head></html>',
        extract.extract_text(desc, 250) + " example.com d",
        fields={"description": extract.extract_text(desc, 250),
                "path_parts": "d"}))
    # 7: empty title, missing metas
    rows.append(_edge(
        "https://empty.example.com/nothing/here",
        '<html><head><meta charset="utf-8"><title></title></head><body>hi</body></html>',
        "example.com nothing here",
        fields={"path_parts": "nothing here"}))
    # 8: multibyte char straddling the 100-byte title boundary
    mb_title = "x" + "é" * 60  # 121 bytes; byte 100 lands mid-rune
    rows.append(_edge(
        "https://mb.example.com/multibyte",
        f'<html><head><meta charset="utf-8"><title>{mb_title}</title></head></html>',
        extract.extract_text(mb_title, 100) + " example.com multibyte",
        fields={"title": extract.extract_text(mb_title, 100),
                "path_parts": "multibyte"}))
    # 9: noindex,nofollow → stub (empty text)
    rows.append(_edge(
        "https://noindex.example.com/secret",
        '<html><head><meta charset="utf-8"><title>hidden</title>'
        '<meta name="robots" content="noindex, nofollow"></head></html>',
        ""))
    # 10: conflicting policies — most restrictive wins → stub
    rows.append(_edge(
        "https://conflict.example.com/policy",
        '<html><head><meta charset="utf-8"><meta name="robots" content="all">'
        '<meta name="robots" content="noindex"></head></html>',
        ""))
    # 11: non-canonical → stub
    rows.append(_edge(
        "https://canon.example.com/a.php",
        '<html><head><meta charset="utf-8"><title>dup page</title>'
        '<link rel="canonical" href="https://canon.example.com/b.php" /></head></html>',
        ""))
    # 12: canonical link pointing at itself → canonical, indexed
    rows.append(_edge(
        "https://selfcanon.example.com/self",
        '<html><head><meta charset="utf-8"><title>self canon</title>'
        '<link rel="canonical" href="https://selfcanon.example.com/self" /></head></html>',
        "self canon example.com self",
        fields={"title": "self canon", "path_parts": "self"}))
    # 13: text/plain MIME row — no head fields, URL-derived text only
    rows.append(_edge(
        "https://plain.example.com/readme",
        "Just a plain text file. No markup here at all.",
        "example.com readme",
        fields={"path_parts": "readme"}))
    # 14: text/xml row — the tokenizer still sees the <title> element,
    # exactly as Go's html.Tokenizer does on XML input
    rows.append(_edge(
        "https://xml.example.com/feed",
        '<?xml version="1.0"?><rss><channel><title>feed</title></channel></rss>',
        "feed example.com feed",
        fields={"title": "feed", "path_parts": "feed"}))
    # 15: cp1252-declared page with accented chars
    rows.append(_edge(
        "https://latin.example.com/cafe",
        '<html><head><meta charset="iso-8859-1"><title>caf\xe9 men\xfa</title></head></html>',
        "café menú example.com cafe", charset="cp1252",
        fields={"title": "café menú", "path_parts": "cafe"}))
    # 16: shift_jis-declared page
    rows.append(_edge(
        "https://jp.example.co.jp/tokyo",
        '<html lang="ja"><head><meta charset="shift_jis"><title>東京 ページ</title></head></html>',
        "東京 ページ example.co.jp tokyo", lang="ja", charset="shift_jis",
        fields={"title": "東京 ページ", "path_parts": "tokyo"}))
    # 17: es language page (TestSetContent "language and policy" shape, indexable)
    rows.append(_edge(
        "https://es.example.com/hola",
        '<html lang="es"><head><meta charset="utf-8"><title>hola mundo</title></head></html>',
        "hola mundo example.com hola", lang="es",
        fields={"title": "hola mundo", "path_parts": "hola"}))
    # 18: pt-BR page with the reference's pt-BR test query terms
    rows.append(_edge(
        "https://br.example.com.br/musica/jimi-hendrix",
        '<html lang="pt-BR"><head><meta charset="utf-8"><title>jimi hendrix guitarra</title>'
        '<meta name="description" content="a lenda jimi hendrix"></head></html>',
        "jimi hendrix guitarra a lenda jimi hendrix example.com.br musica jimi hendrix",
        lang="pt-BR",
        fields={"title": "jimi hendrix guitarra",
                "description": "a lenda jimi hendrix",
                "path_parts": "musica jimi hendrix"}))
    # 19: en page with the reference's en test query terms
    rows.append(_edge(
        "https://music.example.com/bob-dylan.html",
        '<html lang="en"><head><meta charset="utf-8"><title>bob dylan songs</title>'
        '<meta name="keywords" content="bob, dylan, folk, music">'
        '<meta name="description" content="the complete bob dylan discography"></head></html>',
        "bob dylan songs bob dylan folk music "
        "the complete bob dylan discography example.com bob dylan",
        fields={"title": "bob dylan songs",
                "keywords": "bob dylan folk music",
                "description": "the complete bob dylan discography",
                "path_parts": "bob dylan"}))
    # 20: whitespace-run collapse in every field
    rows.append(_edge(
        "https://ws.example.com/spaces",
        '<html><head><meta charset="utf-8"><title>  lots\t\tof\n   space  </title>'
        '<meta name="description" content=" padded   description  "></head></html>',
        "lots of space padded description example.com spaces",
        fields={"title": "lots of space",
                "description": "padded description",
                "path_parts": "spaces"}))
    return rows


_EDGE_ROWS = _mk_edges()
N_EDGE = len(_EDGE_ROWS)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation: spark.range → mapInPandas.

    Row i's content depends only on (seed, i), so output is identical
    at any partition count — the basis for the build-determinism tests.
    """
    import pandas as pd

    from .session import ensure_shipped
    ensure_shipped(spark)

    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def _gen(batches):
        for pdf in batches:
            rows = [gen_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return base.mapInPandas(_gen, schema=PAGES_SCHEMA)


def write_pages(spark, path: str, n: int, seed: int = 42, partitions: int | None = None) -> None:
    pages_df(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
