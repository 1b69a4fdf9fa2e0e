"""Request-side language/region detection vs the reference's own test
tables (frontend/search_test.go TestDetectLanguage:112-174 and
TestDetectRegion:176-212), plus the tld-boost mapping
(search/elasticsearch.go:50-57) and the batch Spark surface."""

from __future__ import annotations

import pytest

from jivesearch_spark import request_lang as rl

# frontend/search_test.go:112-174 — (name, accept_language, l, want)
DETECT_LANGUAGE = [
    ("blank", "", "", []),
    ("basic", "", "en", ["en"]),
    ("french", "", "fr", ["fr"]),
    ("Accept-Language header",
     "fr-CH, fr;q=0.9, en;q=0.8, de;q=0.7", "",
     ["fr-CH", "fr", "en", "de"]),
    ("param overrides Accept-Language header",
     "fr-CH, fr;q=0.9, en;q=0.8, de;q=0.7", "hr",
     ["hr", "fr-CH", "fr", "en", "de"]),
]


@pytest.mark.parametrize("name,accept,l,want", DETECT_LANGUAGE)
def test_detect_language_reference_table(name, accept, l, want):
    assert rl.detect_language(l, accept) == want


def test_detect_language_error_branches():
    # invalid `l` silently dropped (language.Parse error branch)
    assert rl.detect_language("!!", "fr") == ["fr"]
    # malformed header: keep what was collected (search.go:130-134)
    assert rl.detect_language("en", "totally;;garbage===") == ["en"]
    assert rl.detect_language(None, "fr, !!bad!!") == []


# frontend/search_test.go:176-212 — (name, lang, r, want); the empty
# tag goes through the matcher first, which yields the en fallback
DETECT_REGION = [
    ("empty", "und", "", "US"),
    ("basic", "und", "us", "US"),
    ("region from language", "pt-BR", "", "BR"),
    ("param overrides language's region", "fr-CA", "gb", "GB"),
]


@pytest.mark.parametrize("name,lang,r,want", DETECT_REGION)
def test_detect_region_reference_table(name, lang, r, want):
    assert rl.detect_region(lang, r) == want


def test_region_canonicalization_and_likely():
    assert rl.parse_region("uk") == "GB"          # deprecated alias
    assert rl.parse_region("419") == "419"        # UN M.49 numeric
    assert rl.parse_region("xyz") is None
    assert rl.detect_region("pt") == "BR"         # likely region (x/text)
    assert rl.detect_region("ja") == "JP"
    assert rl.detect_region("fr", region_hint="CH") == "CH"  # carried


def test_tld_boost_mapping():
    assert rl.tld_boost_for("DE") == "de"
    assert rl.tld_boost_for("GB") == "uk"         # Region.TLD GB→UK
    assert rl.tld_boost_for("FR") == "fr"
    # non-regional ccTLDs skipped (elasticsearch.go:54)
    for skip in ("US", "TV", "ME", "CO", "IO"):
        assert rl.tld_boost_for(skip) is None
    assert rl.tld_boost_for("419") is None        # numeric: no ccTLD
    assert rl.tld_boost_for(None) is None


def test_full_request_flow():
    # pt-BR browser in Brazil → pt-BR index + .br tld boost
    assert rl.detect_request(None, "pt-BR, pt;q=0.9") == ("pt-BR", "BR", "br")
    # unsupported l + French header → fr index, carried CH region
    lang, region, tld = rl.detect_request("hr", "fr-CH, fr;q=0.9")
    assert (lang, region, tld) == ("fr", "CH", "ch")
    # r param overrides: German browser asking for UK results
    assert rl.detect_request(None, "de-DE", "uk") == ("de", "GB", "uk")
    # nothing at all → English fallback, US region, boost skipped
    assert rl.detect_request(None, None, None) == ("en", "US", None)


@pytest.mark.spark
def test_detect_requests_df_batch(spark):
    rows = [
        ("", "pt-BR, pt;q=0.9", ""),
        ("hr", "fr-CH, fr;q=0.9", ""),
        ("", "de-DE", "uk"),
        ("", "", ""),
    ]
    df = spark.createDataFrame(rows, "l string, accept_language string, r string")
    got = [(r.lang, r.region, r.tld_boost)
           for r in rl.detect_requests_df(df).collect()]
    assert got == [("pt-BR", "BR", "br"), ("fr", "CH", "ch"),
                   ("de", "GB", "uk"), ("en", "US", None)]
