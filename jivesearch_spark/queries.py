"""Reference query set (FIXTURES.md §3).

Seed queries come from the reference's own tests
(/root/reference/search/elasticsearch_test.go:34, 101-107), the rest
give systematic coverage over the synthetic corpus vocabulary: head /
torso / tail terms, MSM-sensitive queries, field-specific matches,
bigram phrases, and regional tld boosts. Vocabulary anchors are pinned
in corpus.ANCHORS.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Query:
    query_id: int
    q: str
    lang: str | None = None   # None = search all languages
    region_tld: str | None = None
    k: int = 10
    msm: bool = True
    shingles: bool = True
    tags: tuple = field(default_factory=tuple)


QUERY_SET: list[Query] = [
    # the reference's own test queries
    Query(1, "Bob Dylan", lang="en", tags=("reference",)),
    Query(2, "jimi hendrix", lang="pt-BR", tags=("reference",)),
    # 1-term head / torso / tail
    Query(3, "bob"),
    Query(4, "stratocaster"),
    Query(5, "telecaster"),
    # 2-term
    Query(6, "jimi hendrix"),
    Query(7, "bob woodstock"),
    # 5-term (MSM allows 1 missing)
    Query(8, "bob dylan jimi hendrix woodstock"),
    # MSM-sensitive: 4 terms, one absent from the corpus entirely
    Query(9, "bob dylan hendrix zzzzqqqqxxxx"),
    # MSM off/on comparison target
    Query(10, "bob dylan folk music", msm=False),
    # domain-only / path-only matches (boost weights 3 / 2)
    Query(11, "example"),
    Query(12, "pagina"),
    # bigram phrase (shingle boost path)
    Query(13, "bob dylan"),
    Query(14, "title of a page"),
    # regional tld boost
    Query(15, "bob dylan", region_tld="uk"),
    Query(16, "jimi", region_tld="br"),
    # no shingles
    Query(17, "bob dylan songs", shingles=False),
    # multilingual partitions
    Query(18, "hola mundo", lang="es"),
    Query(19, "jimi hendrix guitarra", lang="pt-BR"),
    # empty-ish / stop-shaped
    Query(20, "the of a"),
]
