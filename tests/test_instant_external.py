"""Fetcher-backed answerers: trigger fidelity + dispatch priority
(frontend/answer.go:114-179); stub solutions are deterministic."""

from jivesearch_spark.instant.answers import ANSWERERS, detect
from jivesearch_spark.instant.external import so_tag


def test_registry_is_complete_and_ordered():
    names = [a.__class__.__name__ for a in ANSWERERS]
    assert len(names) == 39  # every reference answerer (answer.go:114-179)
    assert names[0] == "BirthStone" and names[-1] == "Wikipedia"
    assert names.index("Speed") < names.index("Length")  # pinned comment
    assert names.index("USPS") < names.index("UPS")


def test_tracking_numbers():
    d = detect("123456789012")                     # 12 digits → FedEx
    assert d.type == "fedex" and d.solution["number"] == "123456789012"
    d = detect("1Z9999999999999999")               # 1Z… → UPS
    assert d.type == "ups" and d.solution["number"].startswith("1Z")
    d = detect("track EA123456789US")              # ..US suffix → USPS
    assert d.type == "usps" and d.solution["number"] == "EA123456789US"


def test_currency_gating():
    d = detect("convert 5 usd to eur")
    assert d.type == "currency"
    assert d.solution["from"] == "USD" and d.solution["to"] == "EUR"
    assert d.solution["notional"] == 5.0
    # bare currency assumes USD for `to` (currency.go:104-111)
    assert detect("125 btc").solution["to"] == "USD"
    # PHP alone is the programming language, not pesos
    assert detect("php").type != "currency"
    # non-currencies fall through the broad regexes
    assert detect("jimi hendrix").type != "currency"


def test_country_gated_answerers():
    assert detect("population of france").type == "population"
    assert detect("germany gdp").type == "gdp"
    assert detect("population of atlantis").type != "population"
    # deterministic stub: same query, same answer
    assert detect("population of france").solution == \
        detect("population of france").solution


def test_congress_state_gating():
    d = detect("senators texas")
    assert d.type == "congress" and d.solution["state"] == "TX"
    assert len(d.solution["members"]) == 2
    assert detect("senators gondor").type != "congress"


def test_discography_breach_shortener():
    assert detect("bob dylan discography").type == "discography"
    assert detect("pwned test@example.com").type == "breach"
    d = detect("shorten https://example.com/a/very/long/path")
    assert d.type == "shortener" and d.solution["short"].startswith("https://is.gd/")
    assert detect("shorten not a url at all").type != "shortener"


def test_stock_weather_whois_maps():
    assert detect("$aapl").type == "stock quote"
    assert detect("aapl quote").type == "stock quote"
    assert detect("aapl").type != "stock quote"    # bare word: unknown ticker
    assert detect("weather 90210").solution["zip"] == "90210"
    assert detect("whois example.com").type == "whois"
    assert detect("whois not a domain").type != "whois"
    assert detect("directions to boston").type == "maps"


def test_stackoverflow_tagger():
    assert so_tag("golang") == "go"
    assert so_tag("mac os") == "macos"
    d = detect("golang convert string to int")
    assert d.type == "stackoverflow" and d.solution["tag"] == "go"


def test_wikipedia_catch_all():
    items = {"bob dylan": {"title": "Bob Dylan",
                           "definition": "American singer-songwriter"}}
    d = detect("bob dylan", wiki_items=items)
    assert d.type == "wikipedia" and d.solution["title"] == "Bob Dylan"
    d = detect("how old is bob dylan", wiki_items=items)
    assert d.type == "wikipedia" and d.solution["fact"] == "how old is"
    # without wiki data nothing is claimed
    assert not detect("bob dylan").triggered


def test_priority_earlier_wins():
    # 'miles per hour' must hit Speed even though Length knows 'miles'
    d = detect("5 miles per hour to km/s")
    assert (d.type, d.solution) == ("unit converter", "speed")
    # Calculator outranks FedEx for arithmetic containing long numbers
    assert detect("123456789012 + 1").type == "calculator"
