"""Per-language analyzer chains (reference: ES language analyzers).

The reference runs one ES index per language analyzer — 33 analyzers,
lang→analyzer map at ``document/elasticsearch.go:205-289``, resolution
walking parent tags (``:28-41``: ``pt-BR``→brazilian, ``en-US``→
english, unknown subtags fall back to the parent).  Analysis =
tokenize → stopword filter → stem.

Pinned here as profile "lang-v1": the pipeline below (standard-ascii
tokenizer from analyze.py → per-language stopword set → stemmer) IS
the spec — applied identically to documents and queries (driver-side
Python and the Arrow-batched Spark UDF share one code path), which is
what rank-identity requires.  English uses the full classic Porter
(1980) algorithm; other Latin-script languages use documented light
suffix-strippers; CJK mirrors ES's ``cjk`` analyzer (character
bigrams).  The default "standard" profile in analyze.py remains the
v1 scorer's analyzer; lang-v1 is the opt-in fielded profile.

Per the input-hint, the Spark path is a vectorized Arrow pandas UDF
(mapInArrow-style batches; the per-token dict/regex work is Python but
amortized across whole record batches — the same shape the reference
delegates to Lucene's analysis chain).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .analyze import _PY_DELIM

# ---------------------------------------------------------------------------
# lang → analyzer resolution (document/elasticsearch.go:205-289, 28-41)
# ---------------------------------------------------------------------------

LANG_ANALYZER = {
    "ar": "arabic", "bg": "bulgarian", "ca": "catalan", "cs": "czech",
    "da": "danish", "de": "german", "el": "greek", "en": "english",
    "en-us": "english", "en-gb": "english", "es": "spanish",
    "es-es": "spanish", "es-419": "spanish", "fa": "persian",
    "fi": "finnish", "fr": "french", "fr-ca": "french", "hi": "hindi",
    "hu": "hungarian", "hy": "armenian", "id": "indonesian",
    "it": "italian", "ja": "cjk", "ko": "cjk", "lt": "lithuanian",
    "lv": "latvian", "nl": "dutch", "no": "norwegian",
    "pt": "portuguese", "pt-br": "brazilian", "pt-pt": "portuguese",
    "ro": "romanian", "ru": "russian", "sv": "swedish", "th": "thai",
    "tr": "turkish", "vi": "cjk", "zh": "cjk", "zh-hans": "cjk",
    "zh-hant": "cjk",
}


def analyzer_for(lang: str, default: str = "english") -> str:
    """Walk parent tags until a mapped analyzer is found
    (elasticsearch.go:28-41); extraction falls back to English
    (document.go:439-447), so unresolvable tags do too."""
    tag = (lang or "").lower().replace("_", "-")
    while tag:
        if tag in LANG_ANALYZER:
            return LANG_ANALYZER[tag]
        tag = tag.rpartition("-")[0]
    return default


# ---------------------------------------------------------------------------
# Porter stemmer (classic 1980 algorithm, full)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]."""
    n, i, length = 0, 0, len(w)
    while i < length and _cons(w, i):
        i += 1
    while i < length:
        while i < length and not _cons(w, i):
            i += 1
        if i >= length:
            break
        n += 1
        while i < length and _cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 1) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
          "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er",
          "ic", "ou"]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (longest matching suffix)
    for suf, rep in sorted(_STEP2, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in sorted(_STEP3, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    pass
                else:
                    w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# light stemmers + stopwords (pinned lang-v1 rules)
# ---------------------------------------------------------------------------

def _light_stem(suffixes: tuple[str, ...], min_len: int = 4):
    ordered = sorted(suffixes, key=len, reverse=True)

    def stem(w: str) -> str:
        for suf in ordered:
            if w.endswith(suf) and len(w) - len(suf) >= min_len - 1:
                return w[: -len(suf)]
        return w
    return stem


#: Lucene's classic English stop set (the `english` analyzer default).
STOP_EN = frozenset("""a an and are as at be but by for if in into is it no
not of on or such that the their then there these they this to was will
with""".split())
STOP_FR = frozenset("le la les de des du un une et en est dans que qui ne pas"
                    " pour sur au aux ce cette il elle".split())
STOP_DE = frozenset("der die das und ist von mit den nicht ein eine im für"
                    " auf dem des sich auch".split())
STOP_ES = frozenset("el la los las de que y en un una se no es por con del"
                    " al lo como".split())
STOP_PT = frozenset("o a os as de que e do da em um uma para com não por se"
                    " na no".split())

_IDENT = lambda w: w  # noqa: E731

#: analyzer name → (stopwords, stem fn). Unlisted analyzers use the
#: standard profile (no stopwords/stemming) until pinned.
ANALYZERS: dict[str, tuple[frozenset, object]] = {
    "english": (STOP_EN, porter_stem),
    "french": (STOP_FR, _light_stem(("ements", "ement", "ances", "ance",
                                     "euses", "euse", "eaux", "aux", "ives",
                                     "ive", "es", "s", "e"))),
    "german": (STOP_DE, _light_stem(("ern", "em", "en", "er", "es", "e",
                                     "s"))),
    "spanish": (STOP_ES, _light_stem(("amientos", "imientos", "amiento",
                                      "imiento", "aciones", "ación", "acion",
                                      "adores", "adora", "ador", "antes",
                                      "ante", "os", "as", "es", "o", "a",
                                      "e"))),
    "portuguese": (STOP_PT, _light_stem(("amentos", "amento", "adores",
                                         "ador", "âncias", "ância", "ancias",
                                         "ancia", "os", "as", "es", "o", "a",
                                         "e"))),
}
ANALYZERS["brazilian"] = ANALYZERS["portuguese"]

_CJK = re.compile("([\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uac00-\ud7af\uf900-\ufaff]+)")


def _cjk_tokens(text: str) -> list[str]:
    """ES ``cjk`` analyzer shape: CJK runs become overlapping character
    bigrams (single char kept when a run has length 1); non-CJK text
    goes through the standard tokenizer."""
    out: list[str] = []
    for i, seg in enumerate(_CJK.split(text)):
        if not seg:
            continue
        if i % 2:  # CJK run
            if len(seg) == 1:
                out.append(seg)
            else:
                out.extend(seg[j:j + 2] for j in range(len(seg) - 1))
        else:
            out.extend(t for t in _PY_DELIM.split(seg.lower()) if t)
    return out


def py_tokens_lang(text: str, analyzer: str = "english") -> list[str]:
    """The ONE lang-v1 pipeline (drives both the oracle and the UDF)."""
    if analyzer == "cjk":
        return _cjk_tokens(text or "")
    stop, stem = ANALYZERS.get(analyzer, (frozenset(), _IDENT))
    toks = [t for t in _PY_DELIM.split((text or "").lower()) if t]
    return [stem(t) for t in toks if t not in stop]


def tokens_lang(col: Column | str, analyzer: str = "english") -> Column:
    """Arrow-batched Spark UDF running py_tokens_lang per row."""
    name = analyzer

    @F.pandas_udf(ArrayType(StringType()))
    def _analyze(s):
        import pandas as pd
        return pd.Series([py_tokens_lang(x, name) for x in s])

    c = F.col(col) if isinstance(col, str) else col
    return _analyze(c)


def analyzed_docs(df, text_col: str = "text", lang_col: str = "lang",
                  out_col: str = "toks"):
    """Route each row through its language's analyzer (the Spark analog
    of one-index-per-analyzer): ONE Arrow-batched UDF over (text, lang)
    resolving the analyzer per row via ``analyzer_for`` — each row is
    tokenized exactly once regardless of how many languages the corpus
    mixes (a CASE-of-UDFs alternative would be hoisted by
    ExtractPythonUDFs and run EVERY analyzer on EVERY row), and NULL /
    unknown langs take the english fallback like extraction does
    (document.go:439-447)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _route(text, lang):
        import pandas as pd
        cache: dict[str, str] = {}
        out = []
        for tx, lg in zip(text, lang):
            key = lg or ""
            an = cache.get(key)
            if an is None:
                an = cache[key] = analyzer_for(key)
            out.append(py_tokens_lang(tx, an))
        return pd.Series(out)

    return df.withColumn(out_col, _route(F.col(text_col), F.col(lang_col)))
