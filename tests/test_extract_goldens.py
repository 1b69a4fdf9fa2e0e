"""Extractor conformance tests — ported from the reference's own
table-driven goldens (/root/reference/search/document/document_test.go).
Every case here must pass byte-identically; this is the per-row
invariant of BASELINE.json's input_hint.
"""

import pytest

from jivesearch_spark import extract, gourl, psl
from jivesearch_spark.extract import Policy, extract_page, extract_text, match_language


# --- TestNew (document_test.go:16-104) -------------------------------------

@pytest.mark.parametrize(
    "link,want_id,want_scheme,want_host,want_domain,want_tld,want_path_parts",
    [
        (
            "htTp://WWW.eXamplE.cOm/This-Part-Can-Be/UpperCase/or/lowercase?And=a+QuerY",
            "http://www.example.com/This-Part-Can-Be/UpperCase/or/lowercase?And=a+QuerY",
            "http", "www.example.com", "example.com", "com",
            "This Part Can Be UpperCase or lowercase",
        ),
        (
            "https://example.com/pagina/#something",
            "https://example.com/pagina/",
            "https", "example.com", "example.com", "com", "pagina",
        ),
        (
            "https://api.example.co.uk/path<s/t#his[/?q=that&p=#that",
            "https://api.example.co.uk/path%3Cs/t",
            "https", "api.example.co.uk", "example.co.uk", "uk", "path<s t",
        ),
    ],
)
def test_new_url_goldens(link, want_id, want_scheme, want_host, want_domain,
                         want_tld, want_path_parts):
    u = gourl.validate_url(link)
    assert u.string() == want_id
    assert u.scheme == want_scheme
    assert u.host == want_host
    assert psl.effective_tld_plus_one(u.host) == want_domain
    assert psl.tld_of(want_domain) == want_tld
    assert gourl.path_parts(u.path) == want_path_parts


@pytest.mark.parametrize("link", ["ftp://news.example.org/news/world",
                                  "/path/somewhere?and=query"])
def test_new_rejects_bad_schemes(link):
    with pytest.raises(gourl.URLError):
        gourl.validate_url(link)


# --- TestSetPolicyFromHeader (document_test.go:222-252) ---------------------

@pytest.mark.parametrize(
    "policies,want_index,want_follow",
    [
        ([""], True, True),
        (["none"], False, False),
        (["all", "noindex, nofollow"], False, False),
        (["all", "nofollow"], True, False),
        (["all", "noindex"], False, True),
        (["noindex, nofollow", "all"], False, False),
    ],
)
def test_policy_most_restrictive_wins(policies, want_index, want_follow):
    p = Policy()
    for directives in policies:
        p.apply(directives)
    assert (p.index, p.follow) == (want_index, want_follow)


# --- TestSetContent (document_test.go:286-462) -------------------------------

BASIC_BODY = """<html>
     <head>
       <title>The title of a page</title>
       <meta name="keywords" content="some keywords for a search engine"/><!--self closing-->
       <meta name="description" content="A description of the content">
     </head>
     <body>
       <a href="http://www.example.com/link/to/somewhere">A link</a>
       <a href="http://www.example.com/donotfollow" rel="nofollow">Don't follow this link!</a>
       <a href="http://www.example.com/link/to/somewhere/else">A link to somewhere else</a>
     </body>
   </html>"""


def test_set_content_basic():
    d = extract_page("http://www.example.com", BASIC_BODY.encode(),
                     truncate_title=100, truncate_keywords=5,
                     truncate_description=14)
    assert d.title == "The title of a page"
    assert d.keywords == "some keywords for a search"
    assert d.description == "A description"
    assert d.lang == "en"
    assert d.index and d.follow
    assert d.links == [
        "http://www.example.com/link/to/somewhere",
        "http://www.example.com/link/to/somewhere/else",
    ]


def test_set_content_language_and_policy():
    body = """<html lang="es">
        <head>
            <meta name="robots" content="noindex, nofollow">
            <meta name="robots" content="noindex, follow"><!-- most restrictive wins -->
        </head>
        <body><a href="http://www.example.com/link/to/somewhere">A link</a></body>
    </html>"""
    d = extract_page("http://www.example.com", body.encode())
    assert d.lang == "es"
    assert d.title == "" and d.keywords == "" and d.description == ""
    assert not d.index and not d.follow
    assert d.links == []  # nofollow ⇒ no link collection


def test_set_content_canonical_link():
    body = """<html>
        <head>
           <title>The title of a page</title>
           <meta name="keywords" content="some keywords for a search engine"/>
           <meta name="description" content="A description of the content">
           <link rel="canonical" href="https://example.com/canonical.php" />
        </head>
        <body><a href="http://www.example.com/link/to/somewhere">A link</a></body>
    </html>"""
    d = extract_page("https://example.com", body.encode(),
                     truncate_keywords=5, truncate_description=14)
    assert d.canonical_url == "https://example.com/canonical.php"
    assert not d.canonical
    assert d.links[0] == "https://example.com/canonical.php"


# --- extractText (document.go:430-437) ---------------------------------------

@pytest.mark.parametrize(
    "s,max_bytes,want",
    [
        ("  a   b\t\tc \n d ", -1, "a b c d"),
        ("hello world", 5, "hello"),
        ("hello world", 8, "hello wo"),
        ("hello world", 11, "hello world"),
        ("hello  ", -1, "hello"),
        ("héllo wörld", 7, "héllo"),  # byte truncation, then trim
        ("", -1, ""),
    ],
)
def test_extract_text(s, max_bytes, want):
    assert extract_text(s, max_bytes) == want


def test_extract_text_byte_truncation_drops_partial_rune():
    # 'x' + 60×'é' = 121 bytes; byte 100 splits an 'é'. Go keeps the raw
    # byte; our pinned rule drops the incomplete trailing sequence.
    s = "x" + "é" * 60
    got = extract_text(s, 100)
    assert len(got.encode("utf-8")) == 99
    assert got == "x" + "é" * 49


# --- language matcher ---------------------------------------------------------

@pytest.mark.parametrize(
    "attr,want",
    [
        (None, "en"), ("", "en"), ("en", "en"), ("EN", "en"),
        ("es", "es"), ("pt-br", "pt-BR"), ("pt", "pt"),
        ("pt-PT", "pt-PT"), ("pt-AO", "pt"), ("ja", "ja"),
        ("xx-klingon", "en"), ("zh-hans", "zh-Hans"), ("en-au", "en"),
    ],
)
def test_match_language(attr, want):
    assert match_language(attr) == want


# --- MIME sniffing ------------------------------------------------------------

@pytest.mark.parametrize(
    "body,want",
    [
        (b"<html><body>this is a body.</body></html>", "text/html"),
        (b"This is a non-html body. Just a simple text body.", "text/plain"),
        (b'<?xml version="1.0"?><rss></rss>', "text/xml"),
        (b"\x00\x01\x02binary", "application/octet-stream"),
        (b"  <!DOCTYPE html><html></html>", "text/html"),
    ],
)
def test_detect_mime(body, want):
    assert extract.detect_mime(body) == want


# --- charset decoding ----------------------------------------------------------

def test_decode_cp1252_fallback():
    assert extract.decode_html("café".encode("cp1252")) == "café"


def test_decode_meta_charset():
    raw = '<html><head><meta charset="shift_jis"><title>東京</title></head></html>'.encode("shift_jis")
    assert "東京" in extract.decode_html(raw)


def test_decode_utf8_bom():
    raw = b"\xef\xbb\xbf" + "<html><title>naïve</title></html>".encode("utf-8")
    assert "naïve" in extract.decode_html(raw)


# --- path() goldens ------------------------------------------------------------

@pytest.mark.parametrize(
    "p,want",
    [
        ("/This-Part-Can-Be/UpperCase/or/lowercase", "This Part Can Be UpperCase or lowercase"),
        ("/pagina/", "pagina"),
        ("/a/b/a/b.html", "a b"),
        ("/x.php.html", "x"),  # Go trims .html then .php sequentially
        ("", ""),
    ],
)
def test_path_parts(p, want):
    assert gourl.path_parts(p) == want
