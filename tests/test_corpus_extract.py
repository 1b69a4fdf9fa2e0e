"""End-to-end extractor invariant: generate the synthetic pages corpus
(html + golden text computed from raw ingredients, FIXTURES.md §1-2),
run the Spark extraction pipeline on the html bytes, and require the
recovered text to be byte-identical per url — the input_hint invariant.
"""

import pytest

from jivesearch_spark import corpus
from jivesearch_spark.extract import extract_page


N_SMOKE = 400  # covers all edge rows + a healthy random sample


def test_gen_is_deterministic_and_partition_independent():
    a = [corpus.gen_page(i) for i in range(100)]
    b = [corpus.gen_page(i) for i in range(100)]
    assert a == b


def test_golden_text_pure_python():
    """Oracle-side check without Spark: html → extract → text must equal
    the generator's golden text for every row."""
    for i in range(N_SMOKE):
        url, ts, html, text, lang = corpus.gen_page(i)
        d = extract_page(url, html)
        got = "" if (not d.index or not d.canonical) else d.text
        assert got == text, f"row {i} ({url}): {got!r} != {text!r}"
        assert d.lang == lang, f"row {i} ({url}): lang {d.lang!r} != {lang!r}"


@pytest.mark.spark
def test_spark_extraction_byte_identical(spark):
    pages = corpus.pages_df(spark, N_SMOKE, partitions=4).cache()
    from jivesearch_spark.extract import extract_pages_df

    extracted = extract_pages_df(pages)
    # Positional comparison: extraction is a narrow map over the cached
    # pages partitions, so collect() order matches on both sides.
    got = extracted.select("text", "lang").collect()
    want = pages.select("text", "lang").collect()
    assert len(got) == len(want) == N_SMOKE
    # pages and extracted preserve row order within mapInPandas (narrow op)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.text == w.text, f"row {i}: {g.text!r} != {w.text!r}"
        assert g.lang == w.lang
    pages.unpersist()
