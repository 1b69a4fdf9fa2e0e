"""Request-side language/region detection (reference: frontend/search.go).

The reference derives the query's language and region from the request
before anything else runs:

- ``detectLanguage`` (frontend/search.go:122-138): the ``l`` param
  (language.Parse, silently dropped when invalid) takes precedence,
  then the ``Accept-Language`` header tags in q-descending order are
  appended; a header parse error returns what was collected so far.
- ``Matcher.Match(preferred...)`` (frontend/search.go:220) picks the
  supported language (document.go:467-547 list; first entry is the
  fallback) — this drives the per-language analyzer/index choice.
- ``detectRegion`` (frontend/search.go:141-148): the ``r`` param
  (ParseRegion) wins; otherwise the matched language's region — the
  x/text matcher carries the preferred tag's explicit region subtag
  through the match, else the likely region — canonicalized.
- the search tier turns the region into a tld should-boost
  (search/elasticsearch.go:50-57): region.TLD() (GB→UK,
  vendor/golang.org/x/text/language/language.go:867-877), skipping
  us/tv/me/co/io which serve non-regional purposes.

All pure driver-side functions; ``detect_requests_df`` is the Arrow-
batched batch surface for replaying a request log.
"""

from __future__ import annotations

import re

from .extract import SUPPORTED_LANGS, match_language

_TAG_RE = re.compile(
    r"^([A-Za-z]{2,3})"
    r"(?:-([A-Za-z]{4}))?"
    r"(?:-([A-Za-z]{2}|[0-9]{3}))?"
    r"(?:-[A-Za-z0-9]{1,8})*$")

#: parse-time region aliases (x/text maps deprecated ISO codes on
#: parse/canonicalize: UK→GB, BU→MM, DD→DE, FX→FR, TP→TL, YD→YE, ZR→CD)
_REGION_ALIASES = {"UK": "GB", "BU": "MM", "DD": "DE", "FX": "FR",
                   "TP": "TL", "YD": "YE", "ZR": "CD"}

#: pinned analogue of x/text addLikelySubtags region inference for the
#: supported list (+ und): Tag.Region() on a region-less tag
LIKELY_REGION = {
    "und": "US", "en": "US", "ar": "EG", "bg": "BG", "ca": "ES",
    "cs": "CZ", "da": "DK", "de": "DE", "el": "GR", "es": "ES",
    "fa": "IR", "fi": "FI", "fr": "FR", "hi": "IN", "hu": "HU",
    "hy": "AM", "id": "ID", "it": "IT", "ja": "JP", "ko": "KR",
    "lt": "LT", "lv": "LV", "nl": "NL", "no": "NO", "pt": "BR",
    "ro": "RO", "ru": "RU", "sv": "SE", "th": "TH", "tr": "TR",
    "vi": "VN", "zh": "CN", "zh-Hans": "CN", "zh-Hant": "TW",
    "es-419": "419",
}


def parse_tag(s: str | None) -> str | None:
    """Light BCP-47 parse (language.Parse analogue for the subset a
    search frontend sees): canonical case lang-Script-REGION, None on
    anything malformed. Extra subtags (variants/extensions) are
    accepted and dropped, matching the matcher's use of the tag."""
    if not s:
        return None
    m = _TAG_RE.match(s.strip().replace("_", "-"))
    if not m:
        return None
    lang, script, region = m.groups()
    out = lang.lower()
    if script:
        out += "-" + script.capitalize()
    if region:
        region = region.upper()
        out += "-" + _REGION_ALIASES.get(region, region)
    return out


def parse_accept_language(header: str | None) -> list[str]:
    """ParseAcceptLanguage analogue: comma-separated ``tag[;q=v]``
    entries → tags sorted by q descending (stable for equal q).
    Raises ValueError on a malformed header — callers mirror the
    reference's error branch (frontend/search.go:130-134) by keeping
    what they already collected."""
    if not header or not header.strip():
        return []
    out = []
    for i, entry in enumerate(header.split(",")):
        entry = entry.strip()
        if not entry:
            raise ValueError(f"empty Accept-Language entry at {i}")
        parts = entry.split(";")
        if parts[0].strip() == "*":     # wildcard: no preference signal
            continue
        tag = parse_tag(parts[0])
        if tag is None:
            raise ValueError(f"bad Accept-Language tag {parts[0]!r}")
        q = 1.0
        for p in parts[1:]:
            p = p.strip()
            if p.startswith("q="):
                try:
                    q = float(p[2:])
                except ValueError as e:
                    raise ValueError(f"bad qvalue {p!r}") from e
        out.append((q, i, tag))
    out.sort(key=lambda t: (-t[0], t[1]))
    return [t for _, _, t in out]


def detect_language(l_param: str | None,
                    accept_language: str | None) -> list[str]:
    """frontend/search.go:122-138 — ``l`` param first (invalid silently
    dropped), then header tags; header parse error keeps only ``l``."""
    preferred = []
    tag = parse_tag(l_param)
    if tag is not None:
        preferred.append(tag)
    try:
        preferred.extend(parse_accept_language(accept_language))
    except ValueError:
        return preferred
    return preferred


_SUPPORTED_LOWER = {t.lower(): t for t in SUPPORTED_LANGS}


def match_supported(preferred: list[str]) -> tuple[str, str | None]:
    """Matcher.Match(preferred...) over the supported list
    (document.go:467-547): first preferred tag with an exact match
    wins, else its base language's first supported tag; nothing
    matches → the English fallback. Returns (supported_tag,
    region_hint) where region_hint is the matching preferred tag's
    explicit region subtag — x/text carries it through the match,
    which is what detectRegion consumes."""
    for tag in preferred:
        low = tag.lower()
        explicit = _explicit_region(tag)
        if low in _SUPPORTED_LOWER:
            return _SUPPORTED_LOWER[low], explicit
        matched = match_language(tag)
        if matched != "en" or low.split("-")[0] in ("en",):
            return matched, explicit
    return "en", None


def _explicit_region(tag: str) -> str | None:
    for part in tag.split("-")[1:]:
        if (len(part) == 2 and part.isalpha()) or \
           (len(part) == 3 and part.isdigit()):
            return part.upper()
    return None


def parse_region(s: str | None) -> str | None:
    """ParseRegion analogue: 2-letter (case-insensitive) or 3-digit
    region, canonicalized; None when unparseable."""
    if not s:
        return None
    s = s.strip()
    if len(s) == 2 and s.isalpha():
        r = s.upper()
        return _REGION_ALIASES.get(r, r)
    if len(s) == 3 and s.isdigit():
        return s
    return None


def detect_region(lang: str, r_param: str | None = None,
                  region_hint: str | None = None) -> str:
    """frontend/search.go:141-148 — ``r`` param wins; otherwise the
    matched language's region (explicit subtag/carried hint, else the
    pinned likely region), canonicalized."""
    r = parse_region(r_param)
    if r is not None:
        return r
    explicit = _explicit_region(lang or "")
    if explicit:
        return _REGION_ALIASES.get(explicit, explicit)
    if region_hint:
        return _REGION_ALIASES.get(region_hint, region_hint)
    base = (lang or "und").split("-")[0].lower() or "und"
    return LIKELY_REGION.get((lang or "und"),
                             LIKELY_REGION.get(base, "ZZ"))


#: region.TLD() skip-set — non-regional ccTLDs (elasticsearch.go:54)
_TLD_SKIP = {"us", "tv", "me", "co", "io"}


def tld_boost_for(region: str | None) -> str | None:
    """search/elasticsearch.go:50-57 — region → tld should-boost term.
    GB maps to the uk ccTLD (x/text Region.TLD); numeric UN M.49
    regions have no ccTLD; us/tv/me/co/io are skipped."""
    if not region or region.isdigit() or len(region) != 2:
        return None
    tld = ("uk" if region.upper() == "GB" else region.lower())
    return None if tld in _TLD_SKIP else tld


def detect_request(l_param: str | None = None,
                   accept_language: str | None = None,
                   r_param: str | None = None) -> tuple[str, str, str | None]:
    """The full getData flow (frontend/search.go:215-221):
    → (supported_lang, region, tld_boost)."""
    preferred = detect_language(l_param, accept_language)
    lang, hint = match_supported(preferred)
    region = detect_region(lang, r_param, hint)
    return lang, region, tld_boost_for(region)


def detect_requests_df(df, l_col: str = "l",
                       accept_col: str = "accept_language",
                       r_col: str = "r"):
    """Batch replay of a request log → (lang, region, tld_boost) per
    row, Arrow-batched (mapInPandas; the per-row work is a dict lookup
    chain — driver-shaped logic at log-replay scale)."""
    import pandas as pd

    from .session import ensure_shipped
    ensure_shipped(df.sparkSession)
    cols = [c for c in (l_col, accept_col, r_col) if c in df.columns]

    def _run(batches):
        for pdf in batches:
            langs, regions, tlds = [], [], []
            for _, row in pdf.iterrows():
                lang, region, tld = detect_request(
                    row.get(l_col), row.get(accept_col), row.get(r_col))
                langs.append(lang)
                regions.append(region)
                tlds.append(tld)
            out = pdf.copy()
            out["lang"], out["region"], out["tld_boost"] = langs, regions, tlds
            yield out

    schema = ", ".join(f"{c} string" for c in cols) + \
        ", lang string, region string, tld_boost string"
    return df.select(*cols).mapInPandas(_run, schema=schema)
