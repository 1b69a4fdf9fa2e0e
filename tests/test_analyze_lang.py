"""Per-language analyzer chains (the pinned LANG_PROFILE).

Mirrors the reference's one-ES-index-per-language-analyzer design
(document/elasticsearch.go:205-289): lang tag resolution walks parent
tags, each analyzer = tokenize → stopword filter → stem, and the
Python oracle path must match the Spark Arrow-UDF path token-for-token
(rank identity depends on doc and query analysis sharing one spec).
"""

import pytest

from jivesearch_spark import analyze_lang as al


# ---------------------------------------------------------------------------
# lang → analyzer resolution (elasticsearch.go:28-41)
# ---------------------------------------------------------------------------

def test_analyzer_resolution_exact():
    assert al.analyzer_for("en") == "english"
    assert al.analyzer_for("pt-BR") == "brazilian"
    assert al.analyzer_for("ja") == "cjk"
    assert al.analyzer_for("de") == "german"


def test_analyzer_resolution_parent_walk():
    # unknown subtag falls back to the parent tag's analyzer
    assert al.analyzer_for("en-AU") == "english"
    assert al.analyzer_for("fr-BE") == "french"
    assert al.analyzer_for("zh-Hant-TW") == "cjk"
    # underscore normalisation
    assert al.analyzer_for("pt_BR") == "brazilian"


def test_analyzer_resolution_fallback():
    assert al.analyzer_for("") == "english"
    assert al.analyzer_for("xx-YY") == "english"
    assert al.analyzer_for(None) == "english"


# ---------------------------------------------------------------------------
# Porter stemmer (classic 1980 algorithm) — published test vectors
# ---------------------------------------------------------------------------

PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PORTER_VECTORS)
def test_porter_vectors(word, stem):
    assert al.porter_stem(word) == stem


# ---------------------------------------------------------------------------
# pipeline: tokenize → stop → stem
# ---------------------------------------------------------------------------

def test_english_pipeline():
    assert al.py_tokens_lang("The running foxes are jumping") == \
        ["run", "fox", "jump"]
    # stopwords removed pre-stem
    assert al.py_tokens_lang("it is a test of the system") == \
        ["test", "system"]


def test_unknown_analyzer_is_identity():
    # unlisted analyzer → standard profile: Unicode tokenize+lowercase
    # only, no stopwords, no stemming
    assert al.py_tokens_lang("Der Hund LÄUFT schnell", "icelandic") == \
        ["der", "hund", "läuft", "schnell"]


def test_unicode_tokenization():
    # the pinned profile tokenizes Unicode word runs (Lucene StandardTokenizer
    # shape); underscore is a delimiter, accents are letters
    assert al.py_tokens_lang("café_crème №42", "icelandic") == \
        ["café", "crème", "42"]


def test_russian_pipeline():
    toks = al.py_tokens_lang("и книгами на столе", "russian")
    assert "и" not in toks and "на" not in toks      # stopwords
    assert toks == ["книг", "стол"]                  # light suffix strip


def test_arabic_article_strip():
    # definite-article prefix strip: الكتاب → كتاب, والكتب → كتب
    assert al.py_tokens_lang("الكتاب والكتب", "arabic") == ["كتاب", "كتب"]


def test_greek_final_sigma_fold():
    toks = al.py_tokens_lang("ο κόσμος", "greek")
    assert toks == ["κόσμ"]                          # ς→σ then suffix strip


def test_thai_run_bigrams():
    toks = al.py_tokens_lang("สวัสดี world", "thai")
    assert "world" in toks
    runs = [t for t in toks if t != "world"]
    assert runs and all(len(t) == 2 for t in runs)


#: the reference's COMPLETE analyzer list — one ES index per name
#: (document/elasticsearch.go:48-54, Setup())
REFERENCE_ANALYZERS = [
    "arabic", "armenian", "basque", "brazilian", "bulgarian", "catalan",
    "cjk", "czech", "danish", "dutch", "english", "finnish", "french",
    "galician", "german", "greek", "hindi", "hungarian", "indonesian",
    "irish", "italian", "latvian", "lithuanian", "norwegian", "persian",
    "portuguese", "romanian", "russian", "sorani", "spanish", "swedish",
    "turkish", "thai",
]


def test_all_reference_analyzers_pinned():
    # every analyzer name the reference maps (elasticsearch.go:205-289)
    # has a pinned profile (stop+stem) or a dedicated pipeline
    mapped = set(al.LANG_ANALYZER.values())
    special = {"cjk", "thai"}
    missing = mapped - special - set(al.ANALYZERS)
    assert not missing, missing


def test_full_reference_setup_list_pinned():
    # lang-v3: every analyzer in the reference's Setup() slice resolves
    # to a pinned chain — nothing silently falls back to standard
    assert len(REFERENCE_ANALYZERS) == 33
    special = {"cjk", "thai"}
    missing = set(REFERENCE_ANALYZERS) - special - set(al.ANALYZERS)
    assert not missing, missing
    # and each previously-unmapped analyzer is now reachable by tag
    assert al.analyzer_for("eu") == "basque"
    assert al.analyzer_for("gl") == "galician"
    assert al.analyzer_for("ga") == "irish"
    assert al.analyzer_for("ckb") == "sorani"
    assert al.analyzer_for("et") == "estonian"


def test_basque_pipeline():
    toks = al.py_tokens_lang("etxeak eta mendiak", "basque")
    assert "eta" not in toks                      # stopword
    assert toks == ["etxe", "mendi"]              # -ak strip


def test_galician_pipeline():
    toks = al.py_tokens_lang("as casas do concello", "galician")
    assert toks == ["cas", "concell"]


def test_irish_prefix_strip():
    # t-prefixation splits at the hyphen; the detached "t" particle is
    # a stopword; "uisce" loses the final vowel like the snowball stem
    assert al.py_tokens_lang("an t-uisce", "irish") == ["uisc"]
    toks = al.py_tokens_lang("na gcapall", "irish")
    assert toks == ["capall"]                     # gc → c radical


def test_sorani_normalization():
    # Arabic kaf/yeh fold to Kurdish forms before suffix strip
    assert al.py_tokens_lang("كتاب", "sorani") == ["کتاب"]
    toks = al.py_tokens_lang("کتابەکان", "sorani")
    assert toks == ["کتاب"]                       # ەکان strip


def test_estonian_pipeline():
    toks = al.py_tokens_lang("raamatutega ja lauaga", "estonian")
    assert "ja" not in toks
    assert toks == ["raamatu", "laua"]


def test_cjk_bigrams():
    assert al.py_tokens_lang("東京タワー", "cjk") == \
        ["東京", "京タ", "タワ", "ワー"]
    # single-char run kept; latin mixed through standard tokenizer
    assert al.py_tokens_lang("木 word", "cjk") == ["木", "word"]


def test_french_light_stem():
    toks = al.py_tokens_lang("les installations nouvelles", "french")
    assert "les" not in toks           # stopword
    assert toks == ["installation", "nouvell"]


# ---------------------------------------------------------------------------
# Spark UDF identity with the Python oracle
# ---------------------------------------------------------------------------

SAMPLES = [
    ("The quick brown foxes were running", "en"),
    ("Les chats noirs dormaient", "fr"),
    ("Der schnelle braune Fuchs", "de"),
    ("Los gatos negros corriendo", "es"),
    ("東京は日本の首都です", "ja"),
    ("", "en"),
    ("mixed 語 text", "zh-Hans"),
    ("null lang rows take the english fallback", None),
    ("unknown lang too", "xx-YY"),
]


@pytest.mark.spark
def test_spark_udf_matches_python(spark):
    df = spark.createDataFrame(SAMPLES, "text string, lang string")
    for an in ("english", "french", "cjk"):
        rows = df.select("text", al.tokens_lang("text", an).alias("t")).collect()
        for r in rows:
            assert list(r.t) == al.py_tokens_lang(r.text, an), (an, r.text)


@pytest.mark.spark
def test_analyzed_docs_routes_by_lang(spark):
    df = spark.createDataFrame(SAMPLES, "text string, lang string")
    rows = al.analyzed_docs(df).collect()
    for r in rows:
        want = al.py_tokens_lang(r.text, al.analyzer_for(r.lang))
        assert list(r.toks) == want, (r.lang, r.text)
