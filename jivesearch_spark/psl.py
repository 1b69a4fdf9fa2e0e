"""Pinned public-suffix subset — eTLD+1 extraction.

The reference uses golang.org/x/net/publicsuffix
(``ExtractDomain``, /root/reference/search/document/document.go:113-117)
which embeds the full Mozilla Public Suffix List. This container has no
network and no publicsuffix package, so we pin a deterministic subset
implementing the same PSL algorithm:

- the longest matching suffix rule wins;
- any single label is implicitly a public suffix (PSL "*" default);
- eTLD+1 = matched suffix plus one more label;
- host == suffix (e.g. "com", "co.uk") is an error, as in Go.

In production swap ``MULTI_SUFFIXES`` for the full list (publicsuffix2
or the embedded Go table); the algorithm is unchanged.
"""

from __future__ import annotations

# Multi-label public suffixes covering the corpora we generate and the
# reference's own test cases (document_test.go:65-79 uses co.uk).
MULTI_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
        "com.br", "net.br", "org.br", "gov.br", "edu.br",
        "co.nz", "net.nz", "org.nz", "govt.nz",
        "co.za", "org.za", "net.za", "gov.za", "ac.za",
        "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "gov.in", "ac.in",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
        "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
        "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
        "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
        "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw",
        "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr",
        "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
        "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk",
        "com.my", "net.my", "org.my", "gov.my", "edu.my",
        "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id",
        "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
        "com.pl", "net.pl", "org.pl", "gov.pl", "edu.pl",
        "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
        "com.ru", "net.ru", "org.ru",
        "co.th", "in.th", "or.th", "go.th", "ac.th",
        "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
        "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
        "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
        "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa",
        "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
        "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    }
)


class DomainError(ValueError):
    """Host has no eTLD+1 (host is itself a public suffix, or empty)."""


def public_suffix(host: str) -> str:
    """Longest matching public suffix of ``host`` under the pinned list."""
    labels = host.split(".")
    # longest multi-label suffix first
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        if cand in MULTI_SUFFIXES:
            return cand
    return labels[-1]


def effective_tld_plus_one(host: str) -> str:
    """eTLD+1, mirroring publicsuffix.EffectiveTLDPlusOne semantics.

    Raises DomainError when host is empty, has a port/invalid chars,
    or equals its own public suffix ("cannot derive eTLD+1").
    """
    if not host or ":" in host or host.startswith(".") or host.endswith("."):
        raise DomainError(f"cannot derive eTLD+1 for {host!r}")
    suffix = public_suffix(host)
    if suffix == host:
        raise DomainError(f"cannot derive eTLD+1 for {host!r}")
    n_suffix = suffix.count(".") + 1
    labels = host.split(".")
    if len(labels) < n_suffix + 1:
        raise DomainError(f"cannot derive eTLD+1 for {host!r}")
    return ".".join(labels[-(n_suffix + 1):])


def tld_of(domain: str) -> str:
    """Last label of the eTLD+1 — reference keeps 'uk' not 'co.uk'
    (document.go:76-84)."""
    return domain.rsplit(".", 1)[-1]
