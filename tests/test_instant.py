"""Golden tests for the instant-answer registry.

The tables below are ported from the reference's embedded per-answer
``tests()`` golden sets (instant/answers.go:62; aggregated by
TestDetect in instant/answers_test.go:83-120) for every answerer we
implement.  Queries and expected solutions are the reference's own.
"""

from __future__ import annotations

import pytest

from jivesearch_spark.instant import detect
from jivesearch_spark.instant.answers import Prime

# (query, expected_type, expected_solution) — solution None means
# "triggered, no/any solution"; dicts compare on the listed keys.
GOLDENS = [
    # birthstone (instant/birthstone.go tests)
    ("september birthstone", "birthstone", "Sapphire"),
    ("birthstone december", "birthstone", "Turquoise, Zircon, Tanzanite"),
    # calculator (instant/calculator.go:97-137)
    ("calculator", "calculator", None),
    ("calculate 2+2", "calculator", 4.0),
    ("(2+2)*3+6.3", "calculator", 18.3),
    ("(2+2)*3/6.4 compute", "calculator", 1.875),
    # '^' is govaluate BITWISE_XOR, looser than additive
    # (vendor/github.com/Knetic/govaluate/OperatorSymbol.go:164,
    # stagePlanner.go planBitwise → planShift → planAdditive):
    # 2 ^ 5 - 1 parses as 2 xor (5-1) = 6; '**' is the power operator
    ("2 ^ 5 - 1", "calculator", 6.0),
    ("7 ^ 2", "calculator", 5.0),
    ("2 ** 5 - 1", "calculator", 31.0),
    ("2 ** 3 ^ 1", "calculator", 9.0),
    # camelcase (instant/camelcase.go:63-95)
    ("camelcase metallica rocks", "camelcase", "MetallicaRocks"),
    ("aliCE in chAins Is better camel case", "camelcase", "AliceInChainsIsBetter"),
    ("camel case O'doyle ruLES", "camelcase", "O'DoyleRules"),
    # characters (instant/characters.go:69-108)
    ('number of chars in "Jimi Hendrix"', "characters", "12"),
    ("number of chars   in Pink   Floyd", "characters", "10"),
    ("Bob Dylan   number of characters in", "characters", "9"),
    ("number of characters Janis   Joplin", "characters", "12"),
    # country code (instant/country_codes.go:92-150)
    ("country code united states", "country code",
     {"format": "ISO 3166-1 alpha-2", "country": "United States", "solution": "US"}),
    ("iso DE", "country code",
     {"format": "ISO 3166-1 alpha-2", "country": "Germany", "solution": "DE"}),
    ("iso code denmark", "country code",
     {"format": "ISO 3166-1 alpha-2", "country": "Denmark", "solution": "DK"}),
    # digital storage / unit converters answer a static marker
    ("convert", "unit converter", "digital storage"),
    ("50gb to mb", "unit converter", "digital storage"),
    ("100 f to c", "unit converter", "temperature"),
    ("5 miles per hour to km/s", "unit converter", "speed"),
    ("5 miles to feet", "unit converter", "length"),
    ("2 megawatts to hp", "unit converter", "power"),
    # frequency (instant/frequency.go:76-129)
    ("a in abracadabra frequency of", "frequency", "5"),
    ("frequency of a in abracadabra", "frequency", "5"),
    ("frequency of o in cooler", "frequency", "2"),
    ("frequency of s in jimi hendrix", "frequency", "0"),
    # hash (instant/hash.go:116-210)
    ("md5 this", "hash",
     {"algo": "MD5", "original": "this",
      "solution": "9e925e9341b490bfd3b4c4ca3b0c1ef2"}),
    ('sha hash of "this entire string"', "hash",
     {"algo": "SHA1", "original": "this entire string",
      "solution": "dd5c370a950f4dbb48a6212b0bde03eb3a021897"}),
    ('sha1 "this entire string"', "hash",
     {"algo": "SHA1", "original": "this entire string",
      "solution": "dd5c370a950f4dbb48a6212b0bde03eb3a021897"}),
    ('sha224 hash of "this entire string"', "hash",
     {"algo": "SHA224", "original": "this entire string",
      "solution": "f9cbc8589549f186e44921d765a93719f380097e0af88070bf6607a9"}),
    ('sha256 hash of "this entire string"', "hash",
     {"algo": "SHA256", "original": "this entire string",
      "solution": "820b0b1b609e77038b1f37e623e7f05cce9f7727fd1f557607e9badd431d208f"}),
    ("sha512 of another string", "hash",
     {"algo": "SHA512", "original": "another string",
      "solution": "410f7993f53b148c5b439c8e48fd5083860d648a00ff7579b0046257822c35"
                  "658591bddc662ea8bda650cd729f1f3f876038240fa0422a811cc00eeff170e500"}),
    # minify / mortgage: trigger-only
    ("minify", "minify", None),
    ("mortgage calculator", "mortgage calculator", None),
    # potus (instant/potus.go:105-160)
    ("current POTUS", "potus", "Donald Trump"),
    ("1st president of the united states", "potus", "George Washington"),
    ("who was the 16nd POTUS", "potus", "Abraham Lincoln"),
    ("22 president of the united states", "potus", "Grover Cleveland"),
    ("24 president of the united states", "potus", "Grover Cleveland"),
    # prime (instant/prime.go:55-123)
    ("prime numbers between 5 and 121", "prime",
     "5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71, "
     "73, 79, 83, 89, 97, 101, 103, 107, 109, 113"),
    ("prime number between 614 and 537", "prime",
     "541, 547, 557, 563, 569, 571, 577, 587, 593, 599, 601, 607"),
    ("prime between -484 and 87", "prime",
     "2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, "
     "67, 71, 73, 79, 83"),
    # reverse (instant/reverse.go:69-101)
    ("reverse ahh lights....ahh see 'em", "reverse", "me' ees hha....sthgil hha"),
    ("reverse 私日本語は話せません", "reverse", "んせませ話は語本日私"),
    ('reverse "ahh yeah"', "reverse", "haey hha"),
    # stats (instant/stats.go:87-152)
    ("avg 3 4e6", "stats", "Average: 2000001.5"),
    ("11 18 -142 Average", "stats", "Average: -37.666666666666664"),
    ("6 3 -5 23 Median", "stats", "Median: 4.5"),
    ("sum 19 77 4.566", "stats", "Sum: 100.566"),
    # urlencode / urldecode (instant/urlencode.go:58-, urldecode.go:58-)
    ("urlencode http://www.example.com?q=this|that", "urlencode",
     "http%3A%2F%2Fwww.example.com%3Fq%3Dthis%7Cthat"),
    ("urldecode http%3A%2F%2Fwww.example.com%3Fq%3Dthis%7Cthat", "urldecode",
     "http://www.example.com?q=this|that"),
    # user agent (instant/useragent.go:63-)
    ("user agent", "user agent", "test-ua"),
    ("what's my useragent", "user agent", "test-ua"),
]


@pytest.mark.parametrize("query,atype,expected",
                         GOLDENS, ids=[g[0][:40] for g in GOLDENS])
def test_goldens(query, atype, expected):
    d = detect(query, user_agent="test-ua")
    assert d.triggered, query
    assert d.type == atype, (query, d.type)
    if expected is not None:
        assert d.solution == expected, (query, d.solution)


def test_coin_and_random_in_range():
    for q, allowed in [
        ("flip a coin", {"Heads", "Tails"}),
        ("heads or tails", {"Heads", "Tails"}),
        ("Coin Toss", {"Heads", "Tails"}),
        ("Random number between 1 and 3", {"1", "2", "3"}),
        ("Random number between 5431 and 5434",
         {"5431", "5432", "5433", "5434"}),
        ("Random number between -18 and -21", {"-18", "-19", "-20", "-21"}),
    ]:
        d = detect(q)
        assert d.triggered and d.solution in allowed, (q, d.solution)
    # seeded → reproducible
    assert detect("flip a coin", seed=7).solution == \
        detect("flip a coin", seed=7).solution


def test_non_triggers():
    # 'vice' POTUS queries and out-of-range ordinals fall through
    for q in ["46th POTUS", "32nd vice POTUS"]:
        d = detect(q)
        assert not (d.triggered and d.type == "potus"), q
    # a tracking number is a FedEx hit (fedex.go:43-49), NOT a calculator hit
    assert detect("123456789012").type == "fedex"
    # plain searches fall through entirely
    assert not detect("bob dylan and the band").triggered


def test_dispatch_order_speed_before_length():
    # frontend/answer.go:136-138 — "miles per hour" must resolve as
    # speed although "miles" alone would trigger length
    d = detect("5 miles per hour to km/s")
    assert d.solution == "speed"


def test_prime_upper_clamp():
    # instant/prime.go:126-134: end clamped at 1,000,000
    d = detect("prime between 999764 and 1000351")
    assert d.triggered
    assert d.solution.endswith("999983")


def test_prime_matches_naive_sieve():
    got = Prime().solve(
        type("M", (), {"remainder": "between 2 and 200", "trigger": "",
                       "named": {}})(), {})
    naive = [n for n in range(2, 199) if all(n % p for p in range(2, n))]
    assert got == ", ".join(str(n) for n in naive)


@pytest.mark.spark
def test_batch_answer_queries(spark):
    from jivesearch_spark.instant import answer_queries
    rows = [("md5 this",), ("reverse abc",), ("not an instant query",),
            ("avg 1 2 3",)]
    df = spark.createDataFrame(rows, "query string")
    out = {r["query"]: r for r in answer_queries(df).collect()}
    assert out["md5 this"]["answer_type"] == "hash"
    assert '"9e925e9341b490bfd3b4c4ca3b0c1ef2"' in out["md5 this"]["solution"]
    assert out["reverse abc"]["solution"] == '"cba"'
    assert not out["not an instant query"]["triggered"]
    assert out["avg 1 2 3"]["solution"] == '"Average: 2"'


@pytest.mark.spark
def test_batch_wikipedia_catch_all(spark):
    """The Wikipedia box (last in dispatch) answers otherwise-unclaimed
    queries from a broadcast wiki-items dimension."""
    import json

    from jivesearch_spark.instant import answer_queries
    items = spark.createDataFrame(
        [("Bob Dylan", "American singer-songwriter")],
        "title string, definition string")
    df = spark.createDataFrame(
        [("bob dylan",), ("define bob dylan",), ("unknown thing",),
         ("reverse abc",)], "query string")
    out = {r["query"]: r for r in
           answer_queries(df, wiki_items=items).collect()}
    assert out["bob dylan"]["answer_type"] == "wikipedia"
    sol = json.loads(out["bob dylan"]["solution"])
    assert sol["title"] == "Bob Dylan"
    assert json.loads(out["define bob dylan"]["solution"])["fact"] == "define"
    assert not out["unknown thing"]["triggered"]
    # earlier answerers still outrank the catch-all
    assert out["reverse abc"]["answer_type"] == "reverse"
