"""Fetcher-backed instant answers (triggers faithful, fetchers stubbed).

The reference's remaining 17 answerers call external services (HIBP,
ProPublica congress, ECB/cryptocompare FX, musicbrainz, FedEx/UPS/USPS
tracking, world-bank GDP/population, geocoding, is.gd, StackOverflow,
IEX quotes, OpenWeatherMap, WHOIS, Wikipedia). This sandbox has no
network, so each answerer here reimplements the reference's TRIGGER
REGEXES and solve-side gating exactly (file:line cited per class), and
replaces only the network fetch with a clearly-marked deterministic
stub (`_stub_*`, seeded by the query) — the same pattern the reference
uses for its own test fetchers (e.g. fedex_test.go mockFetcher). The
dispatch order contract lives in answers.ANSWERERS
(frontend/answer.go:114-179).
"""

from __future__ import annotations

import hashlib

from .answers import Answerer, Match, NotTriggered, _go_title


def _h(s: str, mod: int) -> int:
    """Deterministic stub seed (stable across processes)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


# ---------------------------------------------------------------------------
# answerers, in dispatch order of first appearance
# ---------------------------------------------------------------------------


class Breach(Answerer):
    """instant/breach.go:46-56 (HIBP fetcher stubbed)."""
    type = "breach"
    _T = "have i been pwned|breach|pwned"

    def regexes(self):
        return [rf"^(?P<trigger>{self._T}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self._T})$"]

    def solve(self, m, ctx):
        account = m.remainder
        if not account:
            raise NotTriggered
        pool = ["Adobe", "LinkedIn", "MySpace", "Dropbox", "Canva"]
        n = _h(account, 4)
        return {"account": account,
                "breaches": sorted(pool[i] for i in range(n))}


_US_STATES = {
    "alabama": "AL", "alaska": "AK", "arizona": "AZ", "arkansas": "AR",
    "california": "CA", "colorado": "CO", "connecticut": "CT",
    "delaware": "DE", "florida": "FL", "georgia": "GA", "hawaii": "HI",
    "idaho": "ID", "illinois": "IL", "indiana": "IN", "iowa": "IA",
    "kansas": "KS", "kentucky": "KY", "louisiana": "LA", "maine": "ME",
    "maryland": "MD", "massachusetts": "MA", "michigan": "MI",
    "minnesota": "MN", "mississippi": "MS", "missouri": "MO",
    "montana": "MT", "nebraska": "NE", "nevada": "NV",
    "new hampshire": "NH", "new jersey": "NJ", "new mexico": "NM",
    "new york": "NY", "north carolina": "NC", "north dakota": "ND",
    "ohio": "OH", "oklahoma": "OK", "oregon": "OR", "pennsylvania": "PA",
    "rhode island": "RI", "south carolina": "SC", "south dakota": "SD",
    "tennessee": "TN", "texas": "TX", "utah": "UT", "vermont": "VT",
    "virginia": "VA", "washington": "WA", "west virginia": "WV",
    "wisconsin": "WI", "wyoming": "WY",
}
_STATE_BY_ABBREV = {v.lower(): v for v in _US_STATES.values()}


def _state_of(s: str) -> str | None:
    s = s.strip().lower()
    if s in _US_STATES:
        return _US_STATES[s]
    return _STATE_BY_ABBREV.get(s)


class Congress(Answerer):
    """instant/congress.go:56-75 (ProPublica fetcher stubbed); unknown
    states fail the fetch in the reference ⇒ NotTriggered here."""
    type = "congress"

    def regexes(self):
        sen = "senate|senators|senator"
        mem = "house members|members|member|congress"
        return [rf"^(?P<senate>{sen}) (?P<state>.*)$",
                rf"^(?P<state>.*) (?P<senate>{sen})$",
                rf"^(?P<members>{mem}) (?P<state>.*)$",
                rf"^(?P<state>.*) (?P<members>{mem})$"]

    def solve(self, m, ctx):
        st = _state_of(m.named.get("state", ""))
        if st is None:
            raise NotTriggered
        chamber = "senate" if "senate" in m.named else "house"
        n = 2 if chamber == "senate" else 1 + _h(st, 50)
        return {"state": st, "chamber": chamber,
                "members": [f"{st} {chamber.title()} Member {i + 1}"
                            for i in range(n)]}


_FOREX = ["AUD", "BGN", "BRL", "CAD", "CHF", "CNY", "CZK", "DKK", "EUR",
          "GBP", "HKD", "HRK", "HUF", "IDR", "ILS", "INR", "ISK", "JPY",
          "KRW", "LTL", "MXN", "MYR", "NOK", "NZD", "PHP", "PLN", "RON",
          "RUB", "SEK", "SGD", "THB", "TRY", "USD", "ZAR"]
_CRYPTO = ["BTC", "DOGE", "ETH", "LTC", "XMR", "XRP"]
_CURRENCIES = {c.lower(): c for c in _FOREX + _CRYPTO}


class Currency(Answerer):
    """instant/currency.go:57-75 regexes; solve gating :77-112 (invalid
    from/to ⇒ not an answer; bare PHP assumed programming language;
    missing `to` defaults USD). Rates stubbed deterministically."""
    type = "currency"

    def regexes(self):
        out = []
        for lead in ("convert ", ""):
            out += [rf"^{lead}(?P<notional>\d+) (?P<from>.*) to (?P<to>.*)$",
                    rf"^{lead}(?P<notional>\d+) (?P<from>.*) (?P<to>.*)$",
                    rf"^{lead}(?P<notional>\d+) (?P<from>.*)$",
                    rf"^{lead}(?P<from>.*) to (?P<to>.*)$",
                    rf"^{lead}(?P<from>.*) (?P<to>.*)$",
                    rf"^{lead}(?P<from>.*)$"]
        return out

    def solve(self, m, ctx):
        frm = _CURRENCIES.get(m.named.get("from", "").strip().lower())
        if frm is None:
            raise NotTriggered
        to = _CURRENCIES.get(m.named.get("to", "").strip().lower())
        if to is None:
            if frm == "PHP":  # probably the programming language
                raise NotTriggered
            to = "USD"
        notional = float(m.named.get("notional", 1) or 1)
        rate = 1.0 if frm == to else round(0.5 + _h(frm + to, 1000) / 500, 4)
        return {"from": frm, "to": to, "notional": notional,
                "rate": rate, "quantity": round(notional * rate, 4)}


class Discography(Answerer):
    """instant/discography.go:43-53 (musicbrainz fetcher stubbed)."""
    type = "discography"
    _T = "discography|albums"

    def regexes(self):
        return [rf"^(?P<trigger>{self._T}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self._T})$"]

    def solve(self, m, ctx):
        artist = m.remainder
        if not artist:
            raise NotTriggered
        n = 2 + _h(artist, 4)
        return {"artist": _go_title(artist),
                "albums": [f"{_go_title(artist)} Album {i + 1}"
                           for i in range(n)]}


_STATUSES = ["In transit", "Out for delivery", "Delivered"]


class FedEx(Answerer):
    """instant/fedex.go:43-49 (tracking API stubbed)."""
    type = "fedex"

    def regexes(self):
        return [r"(?i)\b(?P<trigger>[0-9]{10}|[0-9]{12}|[0-9]{15}|[0-9]{20})\b"]

    def solve(self, m, ctx):
        tn = m.trigger
        return {"number": tn, "status": _STATUSES[_h(tn, 3)],
                "url": f"https://www.fedex.com/fedextrack/?tracknumbers={tn}"}


_COUNTRIES = {
    "afghanistan": "AFG", "argentina": "ARG", "australia": "AUS",
    "austria": "AUT", "bangladesh": "BGD", "belgium": "BEL",
    "brazil": "BRA", "canada": "CAN", "chile": "CHL", "china": "CHN",
    "colombia": "COL", "czech republic": "CZE", "denmark": "DNK",
    "egypt": "EGY", "ethiopia": "ETH", "finland": "FIN", "france": "FRA",
    "germany": "DEU", "greece": "GRC", "hungary": "HUN", "india": "IND",
    "indonesia": "IDN", "iran": "IRN", "iraq": "IRQ", "ireland": "IRL",
    "israel": "ISR", "italy": "ITA", "japan": "JPN", "kenya": "KEN",
    "malaysia": "MYS", "mexico": "MEX", "morocco": "MAR",
    "netherlands": "NLD", "new zealand": "NZL", "nigeria": "NGA",
    "norway": "NOR", "pakistan": "PAK", "peru": "PER",
    "philippines": "PHL", "poland": "POL", "portugal": "PRT",
    "romania": "ROU", "russia": "RUS", "saudi arabia": "SAU",
    "singapore": "SGP", "south africa": "ZAF", "south korea": "KOR",
    "spain": "ESP", "sweden": "SWE", "switzerland": "CHE",
    "thailand": "THA", "turkey": "TUR", "ukraine": "UKR",
    "united kingdom": "GBR", "united states": "USA", "vietnam": "VNM",
}


class GDP(Answerer):
    """instant/gdp.go:41-56 (world-bank fetcher stubbed); unknown
    countries fail the fetch ⇒ NotTriggered."""
    type = "gdp"

    def regexes(self):
        out = []
        for w in ("gdp", "gross domestic product"):
            out += [rf"^(?P<country>.*) {w}$", rf"^(?P<country>.*) {w} of$",
                    rf"^{w} of (?P<country>.*)$", rf"^{w} (?P<country>.*)$"]
        return out

    def solve(self, m, ctx):
        code = _COUNTRIES.get(m.named.get("country", "").strip().lower())
        if code is None:
            raise NotTriggered
        base = 100 + _h(code, 20000)
        return {"country": code,
                "series": [{"year": 2015 + i,
                            "value": (base + 37 * i) * 10**9}
                           for i in range(3)]}


class Maps(Answerer):
    """instant/maps.go:42-59 (geocoder stubbed)."""
    type = "maps"
    _T = "maps|map|directions|direction"

    def regexes(self):
        return [r"^directions to (?P<end>.*)$",
                r"^directions (?P<start>.*) to (?P<end>.*)$",
                r"^(?P<start>.*) to (?P<end>.*) directions$",
                r"^(?P<end>.*) directions$",
                rf"^(?P<trigger>{self._T})$",
                rf"^(?P<trigger>{self._T}) .*$",
                rf"^.* (?P<trigger>{self._T})$"]

    def solve(self, m, ctx):
        end = m.named.get("end", "")
        out = {"directions": bool(end) or "direction" in (m.trigger or "")}
        if end:
            out["destination"] = end
            out["lat"] = round(-90 + _h("lat" + end, 180000) / 1000, 3)
            out["lon"] = round(-180 + _h("lon" + end, 360000) / 1000, 3)
        if m.named.get("start"):
            out["origin"] = m.named["start"]
        return out


class Population(Answerer):
    """instant/population.go:40-47 (world-bank fetcher stubbed)."""
    type = "population"

    def regexes(self):
        return [r"^(?P<country>.*) population$",
                r"^(?P<country>.*) population of$",
                r"^population of (?P<country>.*)$",
                r"^population (?P<country>.*)$"]

    def solve(self, m, ctx):
        code = _COUNTRIES.get(m.named.get("country", "").strip().lower())
        if code is None:
            raise NotTriggered
        base = 1 + _h(code, 1000)
        return {"country": code,
                "population": base * 10**6}


class Shortener(Answerer):
    """instant/shortener.go:42-52 (is.gd service stubbed); a remainder
    that isn't a URL fails the service call ⇒ NotTriggered."""
    type = "shortener"
    _T = ("shorten url|shortener|shorten|short url|url short"
          "|url shorten|url shortener")

    def regexes(self):
        return [rf"^(?P<trigger>{self._T}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self._T})$"]

    def solve(self, m, ctx):
        u = m.remainder.strip()
        if not (u.startswith(("http://", "https://")) or "." in u):
            raise NotTriggered
        tag = hashlib.md5(u.encode()).hexdigest()[:6]
        return {"original": u, "short": f"https://is.gd/{tag}"}


class StockQuote(Answerer):
    """instant/stock.go:42-56 regexes verbatim (incl. the inline `^` in
    the ticker group — in Go and Python alike it only matches at string
    start, so the trigger word effectively works only as a suffix).
    The reference answers by fetching the quote and unknown tickers
    fail ⇒ dispatch continues; the stub mirrors that by answering only
    $-prefixed or trigger-worded queries."""
    type = "stock quote"
    _T = "stock quote[s]?|quote[s]?|stock[s]?"
    _TICKER = r"^[\$]?[a-zA-Z]{1,5}[\.]?[a-zA-Z]?"

    def regexes(self):
        return [rf"^(?P<trigger>{self._T})?\s?(?P<remainder>{self._TICKER})$",
                rf"^(?P<remainder>{self._TICKER})\s(?P<trigger>{self._T})?$"]

    def solve(self, m, ctx):
        sym = m.remainder.strip()
        if not (m.trigger or sym.startswith("$")):
            raise NotTriggered  # bare word: unknown-ticker fetch failure
        sym = sym.lstrip("$").upper().rstrip(".")
        if not sym:
            raise NotTriggered
        price = round(5 + _h(sym, 100000) / 100, 2)
        return {"ticker": sym, "price": price,
                "change": round((_h("chg" + sym, 400) - 200) / 100, 2)}


class USPS(Answerer):
    """instant/usps.go:43-49 tracking-number regexes verbatim."""
    type = "usps"

    def regexes(self):
        return [r"(?i)\b(?P<trigger>\d{30}\b)|(\b91\d+\b)|(\b\d{20})\b",
                r"(?i)\b(?P<trigger>E\D{1}\d{9}\D{2}$|^9\d{15,21})\b",
                r"(?i)\b(?P<trigger>91[0-9]+)\b",
                r"(?i)\b(?P<trigger>[A-Za-z]{2}[0-9]+US)\b"]

    def solve(self, m, ctx):
        tn = (m.trigger or "").upper()
        if not tn:
            raise NotTriggered
        return {"number": tn, "status": _STATUSES[_h(tn, 3)],
                "url": f"https://tools.usps.com/go/TrackConfirmAction?tLabels={tn}"}


class UPS(Answerer):
    """instant/ups.go:55-60 tracking-number regex verbatim
    (1Z…/T…/22-digit; solve uppercases — ups.go:63-64)."""
    type = "ups"

    def regexes(self):
        return [r"(?i)\b(?P<trigger>(1Z ?[0-9A-Z]{3} ?[0-9A-Z]{3} ?[0-9A-Z]{2} ?"
                r"[0-9A-Z]{4} ?[0-9A-Z]{3} ?[0-9A-Z]|T\d{3} ?\d{4} ?\d{3}"
                r"|\d{22}))\b"]

    def solve(self, m, ctx):
        tn = m.trigger.upper()
        return {"number": tn, "status": _STATUSES[_h(tn, 3)],
                "url": f"https://www.ups.com/track?tracknum={tn.replace(' ', '')}"}


_SO_TAGS = (
    "mac os|ruby-on-rails|objective-c|elasticsearch|postgresql|angularjs|"
    "javascript|wordpress|node\\.js|selenium|mongodb|reactjs|database|"
    "vue\\.js|android|angular|asp\\.net|eclipse|\\.net|apache|django|"
    "golang|iphone|jquery|matlab|python|regexp|sqlite|macos|excel|html5|"
    "linux|mysql|oracle|redis|regex|ruby|scala|spring|swift|windows|"
    "bash|css3|html|java|json|perl|php|vba|xml|c\\+\\+|csv|css|git|ios|"
    "sql|c#|go|c|r"
)


def so_tag(trigger: str) -> str:
    """stackoverflow.go:88-105 tagger."""
    return {"golang": "go", "mac os": "macos",
            "regexp": "regex"}.get(trigger, trigger)


class StackOverflow(Answerer):
    """instant/stackoverflow.go:55-85 (API fetcher stubbed); tag
    triggers longest-first so 'mac os' beats 'macos' etc."""
    type = "stackoverflow"

    def regexes(self):
        return [rf"^(?P<trigger>{_SO_TAGS}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{_SO_TAGS})$"]

    def solve(self, m, ctx):
        if not m.remainder:
            raise NotTriggered
        tag = so_tag(m.trigger)
        return {"tag": tag, "question": m.remainder,
                "answer": f"Stub top answer for [{tag}] {m.remainder}",
                "votes": 1 + _h(tag + m.remainder, 5000)}


class Weather(Answerer):
    """instant/weather.go:49-60 (OpenWeatherMap fetcher stubbed);
    numeric remainder = zip code, else city (weather.go solve)."""
    type = "weather"
    _T = ("weather forecast for|weather forecast in|weather forecast"
          "|weather for|weather in|weather|climate for|climate"
          "|forecast for|forecast")

    def regexes(self):
        return [rf"^(?P<trigger>{self._T})\s(?P<remainder>.*)$",
                rf"^(?P<remainder>.*)\s(?P<trigger>{self._T})$",
                rf"^(?P<trigger>{self._T})$"]

    def solve(self, m, ctx):
        loc = m.remainder.strip()
        out = {"location": loc or "current location"}
        if loc.isdigit():
            out["zip"] = loc
        temp = 40 + _h("temp" + loc, 60)
        return {**out, "temp_f": temp,
                "conditions": ["Clear", "Clouds", "Rain",
                               "Snow"][_h("cond" + loc, 4)]}


class WHOIS(Answerer):
    """instant/whois.go:41-47 (whois API stubbed); non-domains fail
    the lookup ⇒ NotTriggered."""
    type = "whois"

    def regexes(self):
        return [r"^(?P<trigger>whois) (?P<remainder>.*)$",
                r"^(?P<remainder>.*) (?P<trigger>whois)$"]

    def solve(self, m, ctx):
        d = m.remainder.strip().lower()
        if " " in d or "." not in d:
            raise NotTriggered
        return {"domain": d, "available": _h("avail" + d, 4) == 0,
                "registrar": f"Registrar {1 + _h('reg' + d, 9)}"}


class Wikipedia(Answerer):
    """instant/wikipedia.go:188-210 — fact triggers (age/birthday/
    height/quote/define/…) plus the catch-all `^(?P<remainder>.*)$`
    that must stay LAST (the Wikipedia box answers anything the other
    39 don't — frontend/answer.go:160-163). Solves against an
    in-memory wiki item map (``ctx['wiki_items']`` — the sidecar
    tables wiki.py builds); without one, nothing is claimed."""
    type = "wikipedia"
    _T = ("how old is|how tall is|how tall was|age|birthday|born|death"
          "|died|height|mass|weigh|weight|quotes|quote|definition|define")

    def regexes(self):
        return [rf"^(?P<trigger>{self._T}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self._T})$",
                r"^(?P<remainder>.*)$"]

    def solve(self, m, ctx):
        items = ctx.get("wiki_items")
        if not items:
            raise NotTriggered
        item = items.get(m.remainder.strip().lower())
        if item is None:
            raise NotTriggered
        return {"title": item.get("title", m.remainder),
                "fact": m.trigger or "summary", **item}
