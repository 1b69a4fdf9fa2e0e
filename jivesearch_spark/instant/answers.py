"""Instant-answer registry — first-match-wins trigger dispatch.

Re-expresses the reference's ``Answerer`` surface (interface
``instant/answers.go:53-63``; dispatch order
``frontend/answer.go:114-179``) as a Python registry of pure
functions over the query string.  These run DRIVER-side (per query,
not per row — SURVEY.md §2.10); ``batch.py`` provides the Spark
``mapInPandas`` wrapper for replaying a query-log table through the
same registry.

Semantics per answerer are pinned to the reference (file:line cited on
each class) and gated by the ported golden tables in
``tests/test_instant.py`` (the reference embeds per-answer ``tests()``
golden sets — ``instant/answers.go:62``).

Query normalization = ``Answer.setQuery`` (``instant/answers.go:106-110``):
lowercase, trim space, trim '?', collapse whitespace runs.

Answerers whose reference implementation calls a remote fetcher
(breach, congress, currency, discography, fedex/ups/usps, gdp, maps,
population, shortener, stackoverflow, stock, weather, whois,
wikipedia) are intentionally absent: their compute is the remote
service's, not the engine's.  The wikipedia catch-all is served by the
wiki sidecar tables instead (SURVEY.md §2.3 J3-J5).
"""

from __future__ import annotations

import hashlib
import math
import re
import urllib.parse
from dataclasses import dataclass, field
from typing import Any, Callable

# ---------------------------------------------------------------------------
# framework
# ---------------------------------------------------------------------------


@dataclass
class Data:
    """Mirror of the reference's answer payload (instant/answers.go:81-87)."""
    type: str = ""
    triggered: bool = False
    solution: Any = None


@dataclass
class Match:
    trigger: str = ""
    remainder: str = ""
    named: dict = field(default_factory=dict)


def normalize_query(q: str) -> str:
    """instant/answers.go:106-110 — lowercase, strip, trim '?', collapse ws."""
    q = q.strip().lower().strip("?")
    return " ".join(q.split())


class Answerer:
    """One instant answer: regex trigger list + pure solve().

    ``regexes()`` returns patterns with named groups ``trigger`` /
    ``remainder`` — first pattern that matches wins
    (instant/answers.go:160-187).
    """

    type: str = ""

    def regexes(self) -> list[str]:  # pragma: no cover - abstract
        raise NotImplementedError

    def solve(self, m: Match, ctx: dict) -> Any:
        """Return the solution, or raise NotTriggered."""
        raise NotImplementedError

    _compiled: list[re.Pattern] | None = None

    def trigger(self, query: str) -> Match | None:
        if self._compiled is None:
            self.__class__._compiled = [re.compile(p) for p in self.regexes()]
        for rx in self._compiled:
            # unanchored like Go FindStringSubmatch (answers.go:164) —
            # the tracking-number triggers match mid-query
            mo = rx.search(query)
            if mo is None:
                continue
            gd = mo.groupdict()
            return Match(trigger=gd.get("trigger") or "",
                         remainder=gd.get("remainder") or "",
                         named={k: v for k, v in gd.items()
                                if k not in ("trigger", "remainder") and v})
        return None


class NotTriggered(Exception):
    """solve() determined the query isn't actually this answer
    (mirrors Triggered=false resets, e.g. instant/calculator.go:64-67)."""


def _trim_quotes(s: str) -> str:
    for ch in ('"', "'"):
        s = s.removeprefix(ch).removesuffix(ch)
    return s


def _go_title(s: str) -> str:
    """Go strings.Title: uppercase any letter that follows a non-letter
    (instant/camelcase.go:52-58 relies on this for "o'doyle"→"O'Doyle")."""
    out, prev_letter = [], False
    for ch in s:
        if ch.isalpha() and not prev_letter:
            out.append(ch.upper())
        else:
            out.append(ch)
        prev_letter = ch.isalpha()
    return "".join(out)


def _go_float_str(x: float) -> str:
    """Go strconv.FormatFloat(x, 'f', -1, 64): shortest round-trip
    decimal, never exponent notation."""
    if x == int(x) and abs(x) < 1e16:
        return str(int(x))
    r = repr(x)
    if "e" not in r and "E" not in r:
        return r
    return format(x, ".17f").rstrip("0").rstrip(".")


# ---------------------------------------------------------------------------
# answerers (dispatch order of frontend/answer.go:114-179)
# ---------------------------------------------------------------------------


class BirthStone(Answerer):
    """instant/birthstone.go:40-83."""
    type = "birthstone"
    STONES = {
        "january": "Garnet", "february": "Amethyst",
        "march": "Aquamarine, Bloodstone", "april": "Diamond",
        "may": "Emerald", "june": "Pearl, Moonstone, Alexandrite",
        "july": "Ruby", "august": "Peridot, Spinel",
        "september": "Sapphire", "october": "Opal, Tourmaline",
        "november": "Topaz, Citrine", "december": "Turquoise, Zircon, Tanzanite",
    }

    def regexes(self):
        t = "birthstones|birth stones|birthstone|birth stone"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        sol = self.STONES.get(m.remainder)
        if sol is None:
            raise NotTriggered
        return sol


class Calculator(Answerer):
    """instant/calculator.go:40-95; expression eval per govaluate
    (+ - * / ** parens, float64 arithmetic; ``^`` is BITWISE XOR with
    govaluate's precedence — looser than additive — per
    vendor/github.com/Knetic/govaluate/OperatorSymbol.go:164 and
    stagePlanner.go planBitwise→planShift→planAdditive)."""
    type = "calculator"
    TRIGGERS = ["calculator", "calculate", "compute", "formula", "solve",
                "add", "subtract", "multiply", "divide"]

    def regexes(self):
        t = "|".join(self.TRIGGERS)
        f = r"[\s0-9\.\^+\-*\/\(\)]*"
        return [rf"^(?P<trigger>{t})$",
                rf"^(?P<trigger>{t})?(?P<remainder>{f})$",
                rf"^(?P<remainder>{f})(?P<trigger>{t})?$"]

    def solve(self, m, ctx):
        q = ctx["query"]
        expr = m.remainder
        for t in self.TRIGGERS:
            if q == t:          # bare "calculator" → triggered, no solution
                return None
            expr = expr.replace(t, "")
        if not any(c in expr for c in "+-/*^"):
            raise NotTriggered   # don't swallow tracking numbers etc.
        try:
            return self._eval(expr)
        except Exception:
            raise NotTriggered from None

    @staticmethod
    def _eval(expr: str) -> float:
        import ast
        import operator as op

        # Python's grammar shares govaluate's relative precedence for
        # every operator we accept: BitXor binds looser than Add/Sub,
        # Pow tightest — so the ast parse IS the govaluate parse.
        def xor(left: float, right: float) -> float:
            # bitwiseXORStage: float64(int64(l) ^ int64(r)) —
            # evaluationStage.go:204-206 (int64() truncates toward 0)
            return float(int(left) ^ int(right))

        node = ast.parse(expr.strip(), mode="eval").body
        ops = {ast.Add: op.add, ast.Sub: op.sub, ast.Mult: op.mul,
               ast.Div: op.truediv, ast.Pow: op.pow, ast.BitXor: xor,
               ast.USub: op.neg, ast.UAdd: op.pos}

        def ev(n):
            if isinstance(n, ast.Constant) and isinstance(n.value, (int, float)):
                return float(n.value)
            if isinstance(n, ast.BinOp) and type(n.op) in ops:
                return ops[type(n.op)](ev(n.left), ev(n.right))
            if isinstance(n, ast.UnaryOp) and type(n.op) in ops:
                return ops[type(n.op)](ev(n.operand))
            raise ValueError(f"unsupported expression node {n!r}")
        return ev(node)


class CamelCase(Answerer):
    """instant/camelcase.go:39-60."""
    type = "camelcase"

    def regexes(self):
        t = "camelcase|camel case"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return "".join(_go_title(w) for w in m.remainder.split())


class Characters(Answerer):
    """instant/characters.go:40-67 — count is BYTES (Go len), quotes
    trimmed first."""
    type = "characters"

    def regexes(self):
        t = ("number of characters in|number of characters|"
             "number of chars in|number of chars|"
             "char count of|char count|chars count of|chars count|"
             "character count of|character count|"
             "characters count of|characters count|"
             "length in chars|length in characters")
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return str(len(_trim_quotes(m.remainder).encode("utf-8")))


class Coin(Answerer):
    """instant/coin.go:40-57 — seeded rng injected via ctx for
    reproducibility."""
    type = "coin toss"

    def regexes(self):
        return [r"^(?P<trigger>flip a coin|heads or tails|coin toss)$"]

    def solve(self, m, ctx):
        return ("Heads", "Tails")[ctx["rng"].randrange(2)]


class CountryCode(Answerer):
    """instant/country_codes.go:51-90 (gountries lookup re-expressed as
    a built-in ISO 3166-1 table; name or alpha-2/alpha-3 accepted)."""
    type = "country code"
    FORMAT = "ISO 3166-1 alpha-2"
    # (name, alpha2, alpha3) — common subset; extend as needed
    TABLE = [
        ("United States", "US", "USA"), ("United Kingdom", "GB", "GBR"),
        ("Germany", "DE", "DEU"), ("Denmark", "DK", "DNK"),
        ("France", "FR", "FRA"), ("Spain", "ES", "ESP"),
        ("Italy", "IT", "ITA"), ("Portugal", "PT", "PRT"),
        ("Netherlands", "NL", "NLD"), ("Belgium", "BE", "BEL"),
        ("Switzerland", "CH", "CHE"), ("Austria", "AT", "AUT"),
        ("Sweden", "SE", "SWE"), ("Norway", "NO", "NOR"),
        ("Finland", "FI", "FIN"), ("Ireland", "IE", "IRL"),
        ("Poland", "PL", "POL"), ("Czechia", "CZ", "CZE"),
        ("Greece", "GR", "GRC"), ("Turkey", "TR", "TUR"),
        ("Russia", "RU", "RUS"), ("Ukraine", "UA", "UKR"),
        ("China", "CN", "CHN"), ("Japan", "JP", "JPN"),
        ("South Korea", "KR", "KOR"), ("India", "IN", "IND"),
        ("Indonesia", "ID", "IDN"), ("Australia", "AU", "AUS"),
        ("New Zealand", "NZ", "NZL"), ("Canada", "CA", "CAN"),
        ("Mexico", "MX", "MEX"), ("Brazil", "BR", "BRA"),
        ("Argentina", "AR", "ARG"), ("Chile", "CL", "CHL"),
        ("Colombia", "CO", "COL"), ("Peru", "PE", "PER"),
        ("South Africa", "ZA", "ZAF"), ("Egypt", "EG", "EGY"),
        ("Nigeria", "NG", "NGA"), ("Kenya", "KE", "KEN"),
        ("Israel", "IL", "ISR"), ("Saudi Arabia", "SA", "SAU"),
        ("United Arab Emirates", "AE", "ARE"), ("Singapore", "SG", "SGP"),
        ("Thailand", "TH", "THA"), ("Vietnam", "VN", "VNM"),
        ("Philippines", "PH", "PHL"), ("Malaysia", "MY", "MYS"),
        ("Pakistan", "PK", "PAK"), ("Bangladesh", "BD", "BGD"),
        ("Iceland", "IS", "ISL"), ("Hungary", "HU", "HUN"),
        ("Romania", "RO", "ROU"), ("Bulgaria", "BG", "BGR"),
        ("Croatia", "HR", "HRV"), ("Slovakia", "SK", "SVK"),
        ("Slovenia", "SI", "SVN"), ("Estonia", "EE", "EST"),
        ("Latvia", "LV", "LVA"), ("Lithuania", "LT", "LTU"),
    ]
    BY_NAME = {n.lower(): (n, a2) for n, a2, a3 in TABLE}
    BY_ALPHA = {**{a2.lower(): (n, a2) for n, a2, a3 in TABLE},
                **{a3.lower(): (n, a2) for n, a2, a3 in TABLE}}

    def regexes(self):
        t = "country code|iso code|iso 3166|iso"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        hit = self.BY_NAME.get(m.remainder) or self.BY_ALPHA.get(m.remainder)
        if hit is None:
            raise NotTriggered
        name, a2 = hit
        return {"format": self.FORMAT, "country": name, "solution": a2}


class DigitalStorage(Answerer):
    """instant/digital_storage.go:40-81 — unit-converter trigger; the
    reference defers computation to the client and answers the static
    marker 'digital storage'."""
    type = "unit converter"
    UNITS = ["bit", "byte",
             "kilobit", "kibibit", "kilobyte", "kibibyte",
             "megabit", "mebibit", "megabyte", "mebibyte",
             "gigabit", "gibibit", "gigabyte", "gibibyte",
             "terabit", "tebibit", "terabyte", "tebibyte",
             "petabit", "pebibit", "petabyte", "pebibyte",
             "kb", "kbit", "kibit", "kib",
             "mb", "mbit", "mibit", "mib",
             "gb", "gbit", "gibit", "gib",
             "tb", "tbit", "tibit", "tib",
             "pb", "pbit", "pibit", "pib"]

    def regexes(self):
        us = "|".join(u + "[s]?" for u in self.UNITS)
        t = rf"[0-9 ]*?(?:{us}) to [0-9 ]*?(?:{us})"
        return [r"^(?P<trigger>convert|converter)$",
                rf"^(?P<trigger>{t})(?P<remainder>.*)$",
                rf"^(?P<remainder>.*)(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return "digital storage"


class Frequency(Answerer):
    """instant/frequency.go:42-74 — 'frequency of X in WORD', count of
    single-char X occurrences."""
    type = "frequency"

    def regexes(self):
        return [r"^(?P<trigger>frequency of) (?P<remainder>.*)$",
                r"^(?P<remainder>.*) (?P<trigger>frequency of)$"]

    def solve(self, m, ctx):
        mo = re.match(r"^(.*?) in (.+)", m.remainder)
        if not mo:
            return None
        char, word = mo.group(1), mo.group(2)
        if not char or not word:
            return None
        return str(sum(1 for c in word if c == char))


class Hash(Answerer):
    """instant/hash.go:66-113."""
    type = "hash"
    ALGOS = {"md5": ("MD5", hashlib.md5), "sha": ("SHA1", hashlib.sha1),
             "sha1": ("SHA1", hashlib.sha1), "sha224": ("SHA224", hashlib.sha224),
             "sha256": ("SHA256", hashlib.sha256), "sha512": ("SHA512", hashlib.sha512)}

    def regexes(self):
        return [r"^(?P<trigger>md5|sha|sha1|sha224|sha256|sha512) (?P<remainder>.*)$"]

    def solve(self, m, ctx):
        r = m.remainder
        r = r.removeprefix("hash ").removeprefix("of ")
        r = r.removeprefix('"').removesuffix('"')
        algo, fn = self.ALGOS[m.trigger]
        return {"original": r, "algo": algo,
                "solution": fn(r.strip().encode("utf-8")).hexdigest()}


def _per_unit_regexes(units: list[str], boundary: bool, spaced: bool) -> list[str]:
    """Shared '<n> <unit> to <n> <unit>' trigger shape of the unit
    converters (length.go:45-55, speed.go:38-65, power.go:38-50)."""
    us = "|".join(u + (r"[s]{0,1}\b" if boundary else "[s]?") for u in units)
    body = (rf"[0-9]*\s?(?:{us}) to [0-9]*\s?(?:{us})" if spaced
            else rf"[0-9 ]*?(?:{us}) to [0-9 ]*?(?:{us})")
    return [rf"^(?P<trigger>{body})(?P<remainder>.*)$",
            rf"^(?P<remainder>.*)(?P<trigger>{body})$"]


class Speed(Answerer):
    """instant/speed.go:36-74 — ordered before Length in dispatch so
    'miles per hour' wins over 'miles' (frontend/answer.go:136-138)."""
    type = "unit converter"

    def regexes(self):
        base = ["mile", "foot", "feet", "ft", "kilometer", "km", "meter",
                "knot", "mach"]
        rates = ["s", "hr", "second", "hour"]
        units = []
        for u in (b + "[s]?" for b in base):
            for r in rates:
                units.append(f"{u} per {r}")
                units.append(f"{u}/{r}")
        units += ["mph", "kmh"]
        us = "|".join(units)
        t = rf"[0-9 ]*?(?:{us}) to [0-9 ]*?(?:{us})"
        return [rf"^(?P<trigger>{t})(?P<remainder>.*)$",
                rf"^(?P<remainder>.*)(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return "speed"


class Length(Answerer):
    """instant/length.go:36-64."""
    type = "unit converter"
    UNITS = ["mile", "yard", "foot", "feet", "inch", "nautical mile",
             "ft", "in",
             "centimeter", "millimeter", "micrometer", "nanometer",
             "meter", "kilometer",
             "centimetre", "millimetre", "micrometre", "nanometre",
             "metre", "kilometre",
             "cm", "mm", "nm", "km"]

    def regexes(self):
        us = "|".join(u + r"[s]{0,1}\b" for u in self.UNITS)
        t = rf"[0-9]*\s?(?:{us}) to [0-9]*\s?(?:{us})"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$",
                rf"^(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return "length"


class Minify(Answerer):
    """instant/minify.go:40-55 — trigger-only (client-side tool)."""
    type = "minify"

    def regexes(self):
        t = "minify|minifier|pretty|prettifier|prettify"
        return [rf"^(?P<trigger>{t})$",
                rf"^(?P<trigger>{t}) .*$",
                rf"^.* (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return None


class MortgageCalculator(Answerer):
    """instant/mortgage_calculator.go:39-48 — trigger-only."""
    type = "mortgage calculator"

    def regexes(self):
        t = "mortgage calculator|calculate mortgage|mortgage|mortgage payments"
        return [rf"^(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return None


class Potus(Answerer):
    """instant/potus.go:57-103 — nth president lookup; 0/absent → 45
    (the snapshot's 'current'); 'vice' queries fall through."""
    type = "potus"
    PRESIDENTS = [
        "George Washington", "John Adams", "Thomas Jefferson", "James Madison",
        "James Monroe", "John Quincy Adams", "Andrew Jackson", "Martin Van Buren",
        "William Henry Harrison", "John Tyler", "James K. Polk", "Zachary Taylor",
        "Millard Fillmore", "Franklin Pierce", "James Buchanan", "Abraham Lincoln",
        "Andrew Johnson", "Ulysses S. Grant", "Rutherford B. Hayes",
        "James A. Garfield", "Chester A. Arthur", "Grover Cleveland",
        "Benjamin Harrison", "Grover Cleveland", "William McKinley",
        "Theodore Roosevelt", "William Howard Taft", "Woodrow Wilson",
        "Warren G. Harding", "Calvin Coolidge", "Herbert Hoover",
        "Franklin D. Roosevelt", "Harry S. Truman", "Dwight D. Eisenhower",
        "John F. Kennedy", "Lyndon B. Johnson", "Richard Nixon", "Gerald Ford",
        "Jimmy Carter", "Ronald Reagan", "George H. W. Bush", "Bill Clinton",
        "George W. Bush", "Barack Obama", "Donald Trump",
    ]

    def regexes(self):
        t = "president of the united states|potus"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        # reference resets to empty Data for 'vice' and unknown
        # ordinals (potus.go:71-74, 95-98) — observable = no answer
        if "vice" in ctx["query"]:
            raise NotTriggered
        nums = re.findall(r"[0-9]+", m.remainder)
        i = int(nums[0]) if nums else 0
        if i == 0:
            i = 45
        if not 1 <= i <= len(self.PRESIDENTS):
            raise NotTriggered
        return self.PRESIDENTS[i - 1]


class Power(Answerer):
    """instant/power.go:36-59."""
    type = "unit converter"
    UNITS = ["watt", "kilowatt", "megawatt", "gigawatt", "terawatt",
             "petawatt", "exawatt", "horsepower", "hp"]

    def regexes(self):
        us = "|".join(u + r"[s]{0,1}\b" for u in self.UNITS)
        t = rf"[0-9]*\s?(?:{us}) to [0-9]*\s?(?:{us})"
        return [rf"^(?P<trigger>{t})(?P<remainder>.*)$",
                rf"^(?P<remainder>.*)(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return "power"


class Prime(Answerer):
    """instant/prime.go:43-178 — primes in [max(start,1), end-2] with
    end clamped at 1,000,000 (the sieve's final loop is exclusive of
    the last two indices — preserved as observed behavior, gated by
    the ported goldens)."""
    type = "prime"
    MAX = 1_000_000

    def regexes(self):
        t = "prime numbers|prime number|prime"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        mo = re.match(r"^between (-?[0-9]+) and (-?[0-9]+)", m.remainder)
        if not mo:
            return None
        start, end = int(mo.group(1)), int(mo.group(2))
        if end < start:
            start, end = end, start
        end = min(end, self.MAX)
        start = max(start, 1)
        hi = end - 2  # reference loop stops at len(sieve)-2
        if hi < 2:
            return None
        sieve = bytearray([1]) * (hi + 1)
        sieve[0:2] = b"\x00\x00"
        for p in range(2, int(math.isqrt(hi)) + 1):
            if sieve[p]:
                sieve[p * p::p] = b"\x00" * len(sieve[p * p::p])
        primes = [str(i) for i in range(max(start, 2), hi + 1) if sieve[i]]
        if not primes:
            return None
        return ", ".join(primes)


class Random(Answerer):
    """instant/random.go:43-78 — default range 1..100; swapped bounds
    accepted; seeded rng via ctx."""
    type = "random"

    def regexes(self):
        t = "random number|random number between"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$",
                rf"^(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        lo, hi = 1, 100
        mo = re.search(r"(?P<min>-?\d+).*?(?P<max>-?\d+)", m.remainder)
        if mo:
            lo, hi = int(mo.group("min")), int(mo.group("max"))
        if hi < lo:
            lo, hi = hi, lo
        return str(ctx["rng"].randint(lo, hi))


class Reverse(Answerer):
    """instant/reverse.go:39-66 — rune-wise reverse, quotes trimmed."""
    type = "reverse"

    def regexes(self):
        return [r"^(?P<trigger>reverse) (?P<remainder>.*)$",
                r"^(?P<remainder>.*) (?P<trigger>reverse)$"]

    def solve(self, m, ctx):
        return _trim_quotes(m.remainder)[::-1]


class Stats(Answerer):
    """instant/stats.go:45-85 — avg/median/sum of numbers parsed from
    the remainder (e-notation accepted)."""
    type = "stats"
    NUM = re.compile(r"[-+]?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?")

    def regexes(self):
        t = "avg|average|mean|median|sum|total"
        return [rf"^(?P<trigger>{t}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{t})$"]

    def solve(self, m, ctx):
        nums = [float(mo.group(0)) for mo in self.NUM.finditer(m.remainder)]
        if not nums:
            return None
        tw = m.trigger
        if tw in ("avg", "average", "mean"):
            return "Average: " + _go_float_str(sum(nums) / len(nums))
        if tw == "median":
            s = sorted(nums)
            n = len(s)
            med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0
            return "Median: " + _go_float_str(med)
        return "Sum: " + _go_float_str(sum(nums))


class Temperature(Answerer):
    """instant/temperature.go:36-62."""
    type = "unit converter"

    def regexes(self):
        tr = "celsius|fahrenheit|temperature converter|temp|temperature"
        pats = [r"[0-9]*\s?[cf] to [0-9]*\s?[cf]",
                rf"[0-9]*\s?(?:{tr}) to [0-9]*\s?(?:{tr})"]
        out = []
        for p in pats:
            out.append(rf"^(?P<trigger>{p})(?P<remainder>.*)$")
            out.append(rf"^(?P<remainder>.*)(?P<trigger>{p})$")
        return out

    def solve(self, m, ctx):
        return "temperature"


class URLDecode(Answerer):
    """instant/urldecode.go:40-56."""
    type = "urldecode"
    TRIGGERS = ("urldecode|decodeurl|url decode|decode url|urlunescape|"
                "urlunescaper|unescapeurl|url unescape|url unescaper|"
                "unescape url|uridecode|decodeuri|uri decode|decode uri|"
                "uriunescape|uriunescaper|unescapeuri|uri unescape|"
                "uri unescaper|unescape uri")

    def regexes(self):
        return [rf"^(?P<trigger>{self.TRIGGERS}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self.TRIGGERS})$"]

    def solve(self, m, ctx):
        # Go url.QueryUnescape: '+' → space, %xx decoded
        return urllib.parse.unquote_plus(m.remainder)


class URLEncode(Answerer):
    """instant/urlencode.go:40-56."""
    type = "urlencode"
    TRIGGERS = ("urlencode|encodeurl|url encode|encode url|urlescape|"
                "urlescaper|escapeurl|url escape|url escaper|escape url|"
                "uriencode|encodeuri|uri encode|encode uri|uriescape|"
                "uriescaper|escapeuri|uri escape|uri escaper|escape uri")

    def regexes(self):
        return [rf"^(?P<trigger>{self.TRIGGERS}) (?P<remainder>.*)$",
                rf"^(?P<remainder>.*) (?P<trigger>{self.TRIGGERS})$"]

    def solve(self, m, ctx):
        # Go url.QueryEscape: space → '+', everything non-unreserved %xx
        return urllib.parse.quote_plus(m.remainder, safe="")


class UserAgent(Answerer):
    """instant/useragent.go:41-61."""
    type = "user agent"

    def regexes(self):
        t = ("user agent|useragent|my user agent|my useragent|"
             "what's my user agent|what's my useragent|"
             "what is my user agent|what is my useragent")
        return [rf"^(?P<trigger>{t})$"]

    def solve(self, m, ctx):
        return ctx.get("user_agent", "")


# ---------------------------------------------------------------------------
# registry + dispatch
# ---------------------------------------------------------------------------

# first-match-wins order per frontend/answer.go:114-179 (Speed before
# Length so "miles per hour" beats "miles"; fetcher-backed answers
# omitted — see module docstring)
from . import external  # noqa: E402  (needs Answerer defined above)

#: dispatch priority verbatim from frontend/answer.go:114-179 —
#: Speed before Length ("miles per hour" b/f "miles"), Wikipedia last
#: (the catch-all box)
ANSWERERS: list[Answerer] = [
    BirthStone(), external.Breach(), Calculator(), CamelCase(),
    Characters(), Coin(), external.Congress(), CountryCode(),
    external.Currency(), external.Discography(), DigitalStorage(),
    external.FedEx(), Frequency(), external.GDP(), Hash(), Speed(),
    Length(), external.Maps(), Minify(), MortgageCalculator(),
    external.Population(), Potus(), Power(), Prime(), Random(),
    Reverse(), external.Shortener(), Stats(), external.StockQuote(),
    Temperature(), external.USPS(), external.UPS(), URLDecode(),
    URLEncode(), UserAgent(), external.StackOverflow(),
    external.Weather(), external.WHOIS(), external.Wikipedia(),
]


def detect(query: str, user_agent: str = "", seed: int | None = None,
           answerers: list[Answerer] | None = None,
           wiki_items: dict | None = None) -> Data:
    """DetectInstantAnswer (frontend/answer.go:101-181): normalize the
    query, walk the registry in order, return the first answer whose
    trigger matches and whose solve() doesn't reject. ``wiki_items``
    (title → item dict) backs the Wikipedia catch-all box."""
    import random as _random
    q = normalize_query(query)
    ctx = {"query": q, "user_agent": user_agent,
           "wiki_items": wiki_items,
           "rng": _random.Random(seed if seed is not None
                                 else hash(q) & 0x7FFFFFFF)}
    for ia in (answerers or ANSWERERS):
        m = ia.trigger(q)
        if m is None:
            continue
        try:
            sol = ia.solve(m, ctx)
        except NotTriggered:
            continue
        return Data(type=ia.type, triggered=True, solution=sol)
    return Data()
