"""Per-language analyzer chains (reference: ES language analyzers).

The reference runs one ES index per language analyzer — 33 analyzers,
lang→analyzer map at ``document/elasticsearch.go:205-289``, resolution
walking parent tags (``:28-41``: ``pt-BR``→brazilian, ``en-US``→
english, unknown subtags fall back to the parent).  Analysis =
tokenize → stopword filter → stem.

Pinned here as profile "lang-v3" (``LANG_PROFILE``; v1 was the
ASCII-tokenizer profile with six stop/stem sets, v2 added ~28 pinned
chains, v3 completes the reference's full 33-analyzer Setup() list
(``document/elasticsearch.go:48-54``) — basque / galician / irish /
sorani now have pinned chains (the reference creates their indices
but leaves them unmapped to language tags, an explicit TODO at
``:207-208``; we map eu/gl/ga/ckb to them) plus estonian (et, also a
reference TODO) — index manifests
record the profile at build time and readers refuse a mismatched
version, so a spec change can never silently break doc/query rank
identity): the pipeline below (Unicode word
tokenizer → per-language stopword set → stemmer) IS the spec —
applied identically to documents and queries (driver-side Python and
the Arrow-batched Spark UDF share one code path), which is what
rank-identity requires.  Tokenization is Unicode-aware (``[^\W_]+``,
mirroring Lucene's StandardTokenizer word runs) so Cyrillic / Greek /
Arabic / Indic scripts tokenize properly; English uses the full
classic Porter (1980) algorithm; the other reference analyzers use
documented light suffix-strippers (plus the Arabic definite-article
prefix strip); CJK mirrors ES's ``cjk`` analyzer (character bigrams)
and Thai — segmented by ICU in ES, unavailable here — is pinned as
the same run-bigram scheme over the Thai block.  The default
"standard" profile in analyze.py remains the v1 scorer's analyzer
(ASCII, DuckDB-replayable); the pinned lang profile (LANG_PROFILE) is the opt-in fielded alternative.

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

#: pinned analyzer-spec version, recorded in index manifests
#: (IndexParams.analyzer_profile) and checked at query-analysis time
LANG_PROFILE = "lang-v3"

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
    # the four analyzers the reference creates indices for but leaves
    # unmapped (elasticsearch.go:207-208 TODO) + estonian (":229" TODO)
    # — mapped here to their natural tags so the chains are reachable
    "eu": "basque", "gl": "galician", "ga": "irish", "ckb": "sorani",
    "et": "estonian",
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
# light stemmers + stopwords (pinned lang-profile rules)
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

#: Unicode word tokenizer (letters+digits runs, underscore excluded) —
#: the pinned lang-profile analog of Lucene's StandardTokenizer
_UNI_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)


def _ar_stem(w: str) -> str:
    """Arabic light: strip one definite-article prefix, then one
    common suffix (the shape of Lucene's ArabicStemmer)."""
    for p in ("وال", "بال", "كال", "فال", "لل", "ال"):
        if w.startswith(p) and len(w) - len(p) >= 2:
            w = w[len(p):]
            break
    for s in ("تين", "ات", "ان", "ون", "ين", "ها", "ية", "ة", "ه", "ي"):
        if w.endswith(s) and len(w) - len(s) >= 2:
            return w[: -len(s)]
    return w


def _el_stem(w: str) -> str:
    w = w.replace("ς", "σ")  # final-sigma fold (Greek lowercase filter)
    return _EL_SUFFIX(w)


# suffixes in σ-folded form (the fold runs before the strip)
_EL_SUFFIX = _light_stem(("ματοσ", "ματα", "ουσα", "οντασ", "οσ", "εσ",
                          "ων", "ου", "ησ", "ασ", "α", "ο", "ι", "η", "ε"))

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

#: the remaining reference analyzers (elasticsearch.go:205-289), each a
#: compact high-frequency stopword set + light suffix stripper
ANALYZERS.update({
    "arabic": (frozenset("في من على إلى عن أن إن لا ما هذا هذه التي الذي أو "
                         "ثم كان كانت هو هي و".split()), _ar_stem),
    "bulgarian": (frozenset("и в на не с за да се от по като е са това той "
                            "тя но или а което".split()),
                  _light_stem(("ията", "ите", "ият", "ата", "ото", "ът",
                               "ят", "та", "то", "а", "я", "и", "е", "о"))),
    "catalan": (frozenset("el la els les de que i en un una per amb del al "
                          "es no més ho aquest".split()),
                _light_stem(("aments", "ament", "cions", "ció", "cio",
                             "istes", "ista", "es", "s", "a", "e", "o"))),
    "czech": (frozenset("a se v na je že o s z do i to by pro jako ale si "
                        "tak už po".split()),
              _light_stem(("ování", "ění", "ost", "ách", "ích", "ech", "ům",
                           "ami", "emi", "ého", "ému", "ou", "ě", "í", "é",
                           "á", "y", "i", "a", "o", "u", "e"))),
    "danish": (frozenset("og i at det er en den til af på de som der han "
                         "hun med for ikke".split()),
               _light_stem(("erne", "ende", "erer", "ere", "en", "et", "er",
                            "es", "e", "s"))),
    "greek": (frozenset("και το της ο η των τον την που με σε να από τα "
                        "είναι για δεν στο".split()), _el_stem),
    "persian": (frozenset("و در به از که این را با است برای آن یک تا بر هم "
                          "نیز شد می".split()),
                _light_stem(("ترین", "هایی", "های", "ها", "تر", "ان", "ات"),
                            min_len=3)),
    "finnish": (frozenset("ja on ei se että oli hän joka mutta kun niin "
                          "myös ovat tai sen".split()),
                _light_stem(("ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
                             "ltä", "lle", "ksi", "nen", "ten", "ien", "iin",
                             "in", "n", "t", "a", "ä"))),
    "hindi": (frozenset("के का की है में से को और पर यह कि जो ने भी तो हो "
                        "थे था एक".split()),
              _light_stem(("ों", "ें", "ो", "े", "ी", "ि", "ा"), min_len=2)),
    "hungarian": (frozenset("a az és hogy nem is egy van de ez volt meg már "
                            "csak mint el".split()),
                  _light_stem(("okban", "ekben", "nak", "nek", "val", "vel",
                               "ban", "ben", "ból", "ből", "ra", "re", "on",
                               "en", "ön", "ok", "ek", "ök", "t", "k"))),
    "armenian": (frozenset("և որ է են ու մի այս այդ նրա իր".split()),
                 _light_stem(("ները", "ների", "երը", "երի", "ում", "ով",
                              "ին", "ը", "ն"), min_len=3)),
    "indonesian": (frozenset("yang dan di dengan untuk pada dari dalam "
                             "adalah ini itu ke tidak akan juga".split()),
                   _light_stem(("kan", "nya", "an", "i"))),
    "italian": (frozenset("il lo la i gli le di a da in con su per che e "
                          "non un una è del".split()),
                _light_stem(("azione", "azioni", "amento", "amenti", "mente",
                             "ità", "ivo", "iva", "ivi", "ive", "i", "e",
                             "a", "o"))),
    "lithuanian": (frozenset("ir yra kad į iš su tai bet kaip o jis ji buvo "
                             "už per".split()),
                   _light_stem(("imas", "imai", "uose", "ose", "ais", "ams",
                                "as", "is", "ys", "us", "ai", "ei", "ą", "ę",
                                "į", "ų", "o", "a", "e", "i", "u"))),
    "latvian": (frozenset("un ir ka uz no ar par bet kā tas viņš arī šī "
                          "tik".split()),
                _light_stem(("šana", "iem", "ām", "am", "em", "is", "us",
                             "as", "a", "s", "i", "u", "e"))),
    "dutch": (frozenset("de het een en van in op dat die is was met voor "
                        "niet aan er zijn".split()),
              _light_stem(("heden", "heid", "ingen", "ing", "en", "e",
                           "s"))),
    "norwegian": (frozenset("og i det at en til er som på av for med han de "
                            "ikke den har".split()),
                  _light_stem(("ene", "ere", "est", "en", "et", "er", "es",
                               "e", "s"))),
    "romanian": (frozenset("și în de la a cu pe că este un o nu se din "
                           "pentru mai sau".split()),
                 _light_stem(("ilor", "ului", "elor", "ul", "ea", "le", "ii",
                              "i", "e", "a", "ă"))),
    "russian": (frozenset("и в не на я он с что а то все она так его но да "
                          "ты к у же из за по от это как".split()),
                _light_stem(("иями", "ями", "ами", "ией", "иям", "иях",
                             "ием", "ому", "ему", "ого", "его", "ыми",
                             "ими", "ия", "ий", "ие", "ию", "ей", "ой",
                             "ым", "им", "ах", "ях", "ов", "ев", "ая", "яя",
                             "ую", "юю", "ое", "ее", "ые", "ом", "ем", "ам",
                             "ям", "ы", "и", "а", "я", "о", "е", "у", "ю",
                             "ь"))),
    "swedish": (frozenset("och i att det som en på är av för med till den "
                          "han hon de inte".split()),
                _light_stem(("arna", "erna", "orna", "ande", "ende", "aren",
                             "are", "en", "et", "er", "ar", "or", "a", "e",
                             "s"))),
    "turkish": (frozenset("ve bir bu da de için ile olarak daha çok en gibi "
                          "ama ki ne o".split()),
                _light_stem(("larının", "lerinin", "ların", "lerin", "ları",
                             "leri", "lar", "ler", "ında", "inde", "dan",
                             "den", "tan", "ten", "da", "de", "ta", "te",
                             "ın", "in", "un", "ün", "ı", "i", "u", "ü"))),
})

def _ga_stem(w: str) -> str:
    """Irish light (the shape of Lucene's IrishLowerCaseFilter +
    snowball stemmer): strip an eclipsis cluster back to the radical
    consonant (bhf→f, mb→b, gc→c, nd→d, bp→p, dt→t), then one
    plural/derivational suffix. Hyphen/apostrophe prefixation forms
    (t-uisce, d'uisce) are split by the tokenizer, so the detached
    single-letter particles land in the stop set instead."""
    for p in ("bhf", "mb", "gc", "nd", "bp", "dt"):
        if w.startswith(p) and len(w) - len(p) >= 2:
            w = w[len(p) - 1:]  # keep the radical consonant
            break
    return _GA_SUFFIX(w)


_GA_SUFFIX = _light_stem(("a\u00edochta", "a\u00edocht", "eanna", "acha", "anna",
                          "ach", "ean", "a\u00ed", "ta", "te", "\u00ed", "a", "e"))


def _ckb_stem(w: str) -> str:
    """Sorani: Lucene's SoraniNormalizationFilter shape (fold Arabic
    kaf/yeh variants to Kurdish forms, drop tatweel/ZWNJ) then one
    light suffix strip."""
    w = (w.replace("\u0643", "\u06a9")   # \u0643 \u2192 \u06a9
          .replace("\u064a", "\u06cc")   # \u064a \u2192 \u06cc
          .replace("\u0649", "\u06cc")   # \u0649 \u2192 \u06cc
          .replace("\u0640", "")          # tatweel
          .replace("\u200c", ""))         # ZWNJ
    return _CKB_SUFFIX(w)


_CKB_SUFFIX = _light_stem(("\u06d5\u06a9\u0627\u0646\u06cc\u0627\u0646", "\u06d5\u06a9\u0627\u0646\u0645\u0627\u0646", "\u06d5\u06a9\u0627\u0646", "\u06d5\u06a9\u06d5\u06cc", "\u06d5\u06a9\u06d5",
                           "\u06a9\u0627\u0646", "\u06cc\u0627\u0646", "\u0645\u0627\u0646", "\u062a\u0627\u0646", "\u06ce\u06a9\u06cc", "\u06ce\u06a9",
                           "\u06d5\u0648\u06d5", "\u062f\u0627", "\u0627\u0646", "\u06d5", "\u06cc"), min_len=3)


ANALYZERS.update({
    # the four reference analyzers with no lang mapping yet
    # (elasticsearch.go:207-208) + estonian \u2014 pinned light chains
    "basque": (frozenset("eta edo ez da dira zen bat hau hori du dute ere "
                         "baina zer bere izan den ditu".split()),
               _light_stem(("tzailea", "tasuna", "tasun", "tzeko", "etako",
                            "etan", "aren", "ekin", "ari", "ak", "ek", "en",
                            "an", "ra", "tik", "a", "e", "o"))),
    "galician": (frozenset("o a os as de que e do da en un unha para con "
                           "non por se na no ao como".split()),
                 _light_stem(("amentos", "amento", "aci\u00f3ns", "aci\u00f3n",
                              "ci\u00f3ns", "ci\u00f3n", "cion", "adores", "ador",
                              "istas", "ista", "os", "as", "es", "o", "a",
                              "e"))),
    # trailing single letters = detached prefixation particles
    # (t-uisce / n-\u00e9an / d'\u00f3l split at the hyphen/apostrophe)
    "irish": (frozenset("agus an na is ar go do le i a ag s\u00e9 s\u00ed ach n\u00f3 mar "
                        "\u00f3 at\u00e1 bh\u00ed n\u00ed t n d m h b".split()), _ga_stem),
    "sorani": (frozenset("\u0648 \u0644\u06d5 \u0628\u06d5 \u06a9\u06d5 \u0628\u06c6 \u0626\u06d5\u0645 \u0626\u06d5\u0648 \u062f\u0627 \u0647\u06d5\u0631 \u0644\u06d5\u06af\u06d5\u06b5 \u06a9\u0631\u062f \u0628\u0648\u0648 \u0626\u06d5\u0648\u06d5 "
                         "\u0628\u06d5\u06b5\u0627\u0645 \u0647\u06d5\u06cc\u06d5".split()), _ckb_stem),
    "estonian": (frozenset("ja on ei et kui ta oli see ka ning aga mis v\u00f5i "
                           "oma siis nii".split()),
                 _light_stem(("tega", "dega", "desse", "sse", "ga", "ks",
                              "le", "lt", "st", "ni", "na", "te", "de",
                              "id", "d", "t"))),
})

_CJK = re.compile("([\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uac00-\ud7af\uf900-\ufaff]+)")
_THAI = re.compile("([\u0e00-\u0e7f]+)")


def _run_bigrams(text: str, script_re: re.Pattern) -> list[str]:
    """ES ``cjk`` analyzer shape: script runs become overlapping
    character bigrams (single char kept when a run has length 1);
    other text goes through the word tokenizer. Thai reuses the same
    scheme over its block (ES segments Thai with ICU, unavailable
    here \u2014 pinned deviation)."""
    out: list[str] = []
    for i, seg in enumerate(script_re.split(text)):
        if not seg:
            continue
        if i % 2:  # script run
            if len(seg) == 1:
                out.append(seg)
            else:
                out.extend(seg[j:j + 2] for j in range(len(seg) - 1))
        else:
            out.extend(_UNI_TOKEN.findall(seg.lower()))
    return out


def _cjk_tokens(text: str) -> list[str]:
    return _run_bigrams(text, _CJK)


def py_tokens_lang(text: str, analyzer: str = "english") -> list[str]:
    """The ONE pinned lang-profile pipeline (drives both the oracle and the UDF)."""
    if analyzer == "cjk":
        return _run_bigrams(text or "", _CJK)
    if analyzer == "thai":
        return _run_bigrams(text or "", _THAI)
    stop, stem = ANALYZERS.get(analyzer, (frozenset(), _IDENT))
    toks = _UNI_TOKEN.findall((text or "").lower())
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
