"""!bang dispatch (reference: ``bangs/bangs.go``).

A !bang bypasses search entirely: the query token ``!trigger`` (prefix
or suffix ``!``) selects a provider, the rest of the query is
substituted into the provider's region URL and the caller 302s there
(``frontend/search.go:274-280`` → ``bangs/bangs.go:92-121``).

The reference ships 7,438 bangs in ``bangs/bangs.toml``; the mechanism
is what matters here — ``load_toml()`` reads any file of that shape
(tomllib), and ``BUILTIN`` provides a small freshly-written set of
well-known providers in the same shape for tests and defaults.

This is driver-side control-plane (one lookup per query, against a
broadcastable dict — SURVEY.md §2.3 J6); ``bang_queries`` maps a
query-log column through the same dispatch for offline analytics.
"""

from __future__ import annotations

import os
import urllib.parse
from dataclasses import dataclass, field

DEFAULT_REGION = "default"


@dataclass(frozen=True)
class Bang:
    """bangs/bangs.go:19-27."""
    name: str
    triggers: tuple[str, ...]
    regions: dict[str, str] = field(default_factory=dict)
    favicon: str = ""
    functions: tuple[str, ...] = ()


def wikipedia_canonical(q: str) -> str:
    """bangs/bangs.go:128-130 — "bob maRLey" → "Bob_Marley"."""
    return q.lower().title().replace(" ", "_")


FUNCTIONS = {"wikipediaCanonical": wikipedia_canonical}

# A small built-in provider set (original entries in the reference's
# data shape; the full reference list is loadable via load_toml).
BUILTIN: list[Bang] = [
    Bang("Google", ("g", "google"),
         {"default": "https://encrypted.google.com/search?hl={{{lang}}}&q={{{term}}}",
          "fr": "https://www.google.fr/search?hl={{{lang}}}&q={{{term}}}",
          "ca": "https://www.google.ca/search?q={{{term}}}",
          "ru": "https://www.google.ru/search?hl={{{lang}}}&q={{{term}}}"}),
    Bang("Google France", ("gfr", "googlefr"),
         {"default": "https://www.google.fr/search?hl={{{lang}}}&q={{{term}}}"}),
    Bang("Google Images", ("gi", "images"),
         {"default": "https://www.google.com/search?tbm=isch&q={{{term}}}"}),
    Bang("Wikipedia", ("w", "wikipedia", "wiki", "encyclopedia", "wen"),
         {"default": "https://en.wikipedia.org/wiki/{{{term}}}",
          "es": "https://es.wikipedia.org/wiki/{{{term}}}",
          "de": "https://de.wikipedia.org/wiki/{{{term}}}",
          "fr": "https://fr.wikipedia.org/wiki/{{{term}}}"},
         functions=("wikipediaCanonical",)),
    Bang("GitHub", ("gh", "github"),
         {"default": "https://github.com/search?q={{{term}}}&type=Everything"}),
    Bang("YouTube", ("yt", "youtube"),
         {"default": "https://www.youtube.com/results?search_query={{{term}}}"}),
    Bang("Amazon", ("a", "amazon"),
         {"default": "https://www.amazon.com/s?k={{{term}}}",
          "uk": "https://www.amazon.co.uk/s?k={{{term}}}",
          "fr": "https://www.amazon.fr/s?k={{{term}}}",
          "ca": "https://www.amazon.ca/s?k={{{term}}}"}),
    Bang("Reddit", ("r", "reddit"),
         {"default": "https://www.reddit.com/search?q={{{term}}}"}),
    Bang("Stack Overflow", ("so", "stackoverflow"),
         {"default": "https://stackoverflow.com/search?q={{{term}}}"}),
    Bang("DuckDuckGo", ("ddg", "duckduckgo"),
         {"default": "https://duckduckgo.com/?q={{{term}}}"}),
    Bang("Bing", ("b", "bing"),
         {"default": "https://www.bing.com/search?q={{{term}}}"}),
    Bang("Twitter", ("tw", "twitter"),
         {"default": "https://twitter.com/search?q={{{term}}}"}),
    Bang("OpenStreetMap", ("osm", "openstreetmap"),
         {"default": "https://www.openstreetmap.org/search?query={{{term}}}"}),
]


def load_toml(path: str) -> list[Bang]:
    """Load a bangs.toml-shaped file (bangs/bangs.go:56-66 semantics:
    ``[[bang]]`` stanzas with name/favicon/triggers/functions and a
    ``[bang.regions]`` table)."""
    import tomllib
    with open(path, "rb") as fh:
        raw = tomllib.load(fh)
    out = []
    for b in raw.get("bang", []):
        out.append(Bang(name=b.get("name", ""),
                        triggers=tuple(b.get("triggers", [])),
                        regions=dict(b.get("regions", {})),
                        favicon=b.get("favicon", ""),
                        functions=tuple(b.get("functions", []))))
    return out


class Bangs:
    """Trigger dict + detection (bangs/bangs.go:92-139)."""

    def __init__(self, bangs: list[Bang] | None = None):
        self.bangs = list(BUILTIN if bangs is None else bangs)
        # exact-match trigger dict — the broadcastable artifact
        self.by_trigger: dict[str, Bang] = {}
        for b in self.bangs:
            for t in b.triggers:
                self.by_trigger.setdefault(t, b)

    def detect(self, q: str, region: str = "US",
               lang: str = "en") -> tuple[Bang | None, str, bool]:
        """bangs/bangs.go:92-121 — first field with a ``!`` prefix or
        suffix whose trimmed lowercase form matches a trigger wins; the
        remaining fields (original case) are the term; bang functions
        apply; region key falls back to ``default``; ``{{{term}}}`` is
        query-escaped, ``{{{lang}}}`` substituted verbatim."""
        fields = q.split()
        for i, f in enumerate(fields):
            if f == "!" or (not f.startswith("!") and not f.endswith("!")):
                continue
            k = f.strip("!").lower()
            b = self.by_trigger.get(k)
            if b is None:
                continue
            remainder = " ".join(fields[:i] + fields[i + 1:])
            for fname in b.functions:
                remainder = FUNCTIONS[fname](remainder)
            for reg in (region.lower(), DEFAULT_REGION):
                if reg in b.regions:
                    u = b.regions[reg].replace(
                        "{{{term}}}", urllib.parse.quote_plus(remainder))
                    return b, u.replace("{{{lang}}}", lang), True
        return None, "", False

    def suggest(self, term: str, size: int = 10) -> list[dict]:
        """Trigger-prefix autocomplete (bangs/bangs.go:69-90; ES
        completion suggester re-expressed as an ordered prefix scan)."""
        t = term.lstrip("!").lower()
        hits = sorted({(trig, b.name, b.favicon)
                       for trig, b in self.by_trigger.items()
                       if trig.startswith(t)})
        return [{"trigger": trig, "name": name, "favicon": fav}
                for trig, name, fav in hits[:size]]

    def default_suggestions(self) -> list[dict]:
        """The ``q == "!"`` static suggestion set — a pinned list of
        default triggers resolved against the corpus
        (frontend/frontend.go:209-235: triggers ["g","a","b","reddit",
        "w"], every bang carrying that trigger appended in order)."""
        out = []
        for trigger in DEFAULT_SUGGEST_TRIGGERS:
            for b in self.bangs:
                if trigger in b.triggers:
                    out.append({"trigger": trigger, "name": b.name,
                                "favicon": b.favicon})
        return out


#: frontend/frontend.go:211 — the default-suggestion trigger list
DEFAULT_SUGGEST_TRIGGERS = ("g", "a", "b", "reddit", "w")

#: env var naming a full bangs.toml corpus (the reference ships 7,438
#: bangs in bangs/bangs.toml); when unset/missing, well-known install
#: locations are probed, then BUILTIN is used.
BANGS_TOML_ENV = "JIVESEARCH_BANGS_TOML"

#: probed when the env is unset: data/ dirs anchored at this package
#: and the repo root, resolved via __file__ — NEVER the CWD and never
#: an absolute path outside the repo (round-3 advice: library defaults
#: must not trust an unowned external checkout; pointing at a
#: reference snapshot is explicit env wiring, done in the test/driver
#: harness only)
_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANGS_TOML_PATHS = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                 "bangs.toml"),
    os.path.join(_REPO_DIR, "data", "bangs.toml"),
)


def corpus_path() -> str | None:
    """Path of the full bangs corpus: the env wins, else the first
    well-known location that exists, else None (→ BUILTIN)."""
    p = os.environ.get(BANGS_TOML_ENV, "")
    if p:
        return p if os.path.exists(p) else None
    for cand in BANGS_TOML_PATHS:
        if os.path.exists(cand):
            return cand
    return None


def default_corpus() -> list[Bang]:
    """The full wired corpus when available, else BUILTIN — callers
    that want "whatever this deployment ships" use this."""
    p = corpus_path()
    return load_toml(p) if p else list(BUILTIN)


def bang_queries(df, bangs: Bangs | None = None, query_col: str = "query",
                 region_col: str | None = None):
    """Batch replay of a query log through bang detection —
    (query[, region]) → (query, bang_name, location, triggered).
    Broadcast-style: the trigger dict ships inside the Arrow UDF
    closure, one dict lookup per query."""
    from pyspark.sql import functions as F  # noqa: F401

    from .session import ensure_shipped
    ensure_shipped(df.sparkSession)
    bb = bangs or Bangs()
    payload = [(b.name, tuple(b.triggers), dict(b.regions), b.favicon,
                tuple(b.functions)) for b in bb.bangs]
    cols = [query_col] + ([region_col] if region_col else [])

    def _run(batches):
        import pandas as pd

        from jivesearch_spark.bangs import Bang, Bangs
        local = Bangs([Bang(n, t, r, f, fn) for n, t, r, f, fn in payload])
        for pdf in batches:
            names, locs, trig = [], [], []
            regions = (pdf[region_col].astype(str) if region_col
                       else ["US"] * len(pdf))
            for q, reg in zip(pdf[query_col].astype(str), regions):
                b, loc, ok = local.detect(q, region=reg)
                names.append(b.name if b else None)
                locs.append(loc or None)
                trig.append(ok)
            yield pd.DataFrame({"query": pdf[query_col], "bang_name": names,
                                "location": locs, "triggered": trig})

    return df.select(*cols).mapInPandas(
        _run, schema="query string, bang_name string, location string, triggered boolean")
