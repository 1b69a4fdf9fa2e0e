"""HTML → indexed-text extractor, byte-identical to the reference.

Reimplements the reference extraction pipeline
(/root/reference/search/document/document.go) as pure Python callable
inside Arrow-batched pandas UDFs:

- ``extract_text``   — document.go:430-437 (whitespace collapse, BYTE
  truncation, trim). One pinned divergence: Go byte-slicing can leave a
  dangling partial UTF-8 rune; Arrow string columns must be valid
  UTF-8, so we drop an incomplete trailing sequence. All reference
  goldens (ASCII) are unaffected.
- title/keywords/description — document.go:232-281 (title last text
  token wins; keywords comma→space, dedup, 25-word cap; description
  250-char cap).
- robots policy merge — document.go:157-194 (most restrictive wins).
- canonical        — document.go:256-263, 350-367.
- language matcher — document.go:439-447 + supported list :467-547.
- MIME sniff       — document.go:198-215 (Go http.DetectContentType
  subset for text/html vs text/plain vs text/xml).
- charset          — x/net/html/charset semantics: BOM → meta prescan
  (first 1024 bytes) → windows-1252 fallback.

The per-page **indexed text** is exactly
``title ⊕ keywords ⊕ description ⊕ domain ⊕ path_parts`` (non-empty
fields joined by one space) — jivesearch never indexes body text; only
head-extracted fields plus URL-derived fields are searchable
(SURVEY.md §1.1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from . import gourl, psl

# Truncation limits — /root/reference/config/config.go:129-131
TRUNCATE_TITLE = 100
TRUNCATE_KEYWORDS = 25
TRUNCATE_DESCRIPTION = 250

# Supported language tags, verbatim order from document.go:467-547
# (first entry is the fallback). Keys lowercase for matching.
SUPPORTED_LANGS = [
    "en", "ar", "bg", "ca", "cs", "da", "de", "el", "en-US", "en-GB",
    "es", "es-ES", "es-419", "fa", "fi", "fr", "fr-CA", "hi", "hu",
    "hy", "id", "it", "ja", "ko", "lt", "lv", "nl", "no", "pt",
    "pt-BR", "pt-PT", "ro", "ru", "sv", "th", "tr", "vi", "zh",
    "zh-Hans", "zh-Hant",
]
_LANG_EXACT = {t.lower(): t for t in SUPPORTED_LANGS}
_LANG_BASE: dict[str, str] = {}
for _t in SUPPORTED_LANGS:
    _LANG_BASE.setdefault(_t.split("-")[0].lower(), _t)


def match_language(lang_attr: str | None) -> str:
    """Pinned analogue of language.Matcher.Match (document.go:439-447).

    Exact tag match → that tag; else base-language match → the first
    supported tag with that base; else English fallback.
    """
    if not lang_attr:
        return "en"
    low = lang_attr.strip().lower()
    if low in _LANG_EXACT:
        return _LANG_EXACT[low]
    base = low.split("-")[0].split("_")[0]
    if base in _LANG_EXACT:
        return _LANG_EXACT[base]
    if base in _LANG_BASE:
        return _LANG_BASE[base]
    return "en"


def extract_text(s: str, max_bytes: int) -> str:
    """document.go:430-437 — collapse whitespace runs, byte-truncate, trim."""
    s = " ".join(s.split())
    if max_bytes != -1:
        b = s.encode("utf-8")
        if len(b) > max_bytes:
            s = b[:max_bytes].decode("utf-8", errors="ignore")
    return s.strip()


# ---------------------------------------------------------------------------
# MIME sniffing — Go http.DetectContentType subset (document.go:198-215)
# ---------------------------------------------------------------------------

_HTML_SIGS = [
    b"<!DOCTYPE HTML", b"<HTML", b"<HEAD", b"<SCRIPT", b"<IFRAME",
    b"<H1", b"<DIV", b"<FONT", b"<TABLE", b"<A", b"<STYLE",
    b"<TITLE", b"<B", b"<BODY", b"<BR", b"<P", b"<!--",
]


def detect_mime(data: bytes) -> str:
    """Subset of Go DetectContentType for the types the crawler keeps
    (text/html, text/plain, text/xml — crawler.go:291-293)."""
    peek = data[:512]
    stripped = peek.lstrip(b"\t\n\x0c\r ")
    upper = stripped.upper()
    for sig in _HTML_SIGS:
        if upper.startswith(sig):
            term = stripped[len(sig) : len(sig) + 1]
            if term in (b" ", b">") or (sig == b"<!--"):
                return "text/html"
    if stripped.startswith(b"<?xml"):
        return "text/xml"
    if peek.startswith(b"\xef\xbb\xbf") or peek.startswith(b"\xfe\xff") or peek.startswith(b"\xff\xfe"):
        return "text/plain"
    # binary sniff: any byte outside Go's plain-text table ⇒ octet-stream
    for b in peek:
        if b < 0x20 and b not in (0x09, 0x0A, 0x0C, 0x0D, 0x1B):
            return "application/octet-stream"
    return "text/plain"


# ---------------------------------------------------------------------------
# Charset detection — x/net/html/charset.NewReader semantics
# ---------------------------------------------------------------------------

_META_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-:.]+)""", re.IGNORECASE)

_CHARSET_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "iso-8859-1": "cp1252", "latin-1": "cp1252", "latin1": "cp1252",
    "windows-1252": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk", "big5": "big5",
    "euc-kr": "euc_kr", "iso-8859-2": "iso8859-2", "windows-1251": "cp1251",
    "koi8-r": "koi8-r", "iso-8859-15": "iso8859-15", "utf-16": "utf-16",
    "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def decode_html(data: bytes) -> str:
    """BOM → <meta charset> prescan (1024 bytes) → windows-1252 fallback,
    mirroring x/net/html/charset (undefined cp1252 bytes → U+FFFD like
    x/text charmap)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8", errors="replace")
    if data.startswith(b"\xff\xfe"):
        return data[2:].decode("utf-16-le", errors="replace")
    if data.startswith(b"\xfe\xff"):
        return data[2:].decode("utf-16-be", errors="replace")
    m = _META_CHARSET_RE.search(data[:1024])
    if m:
        name = m.group(1).decode("ascii", errors="ignore").lower()
        codec = _CHARSET_ALIASES.get(name)
        if codec:
            return data.decode(codec, errors="replace")
    return data.decode("cp1252", errors="replace")


# ---------------------------------------------------------------------------
# Policy
# ---------------------------------------------------------------------------

@dataclass
class Policy:
    """document.go:59-62 — default permissive; most restrictive wins."""

    index: bool = True
    follow: bool = True

    def apply(self, directives: str) -> None:
        """document.go:178-194 setPolicy."""
        for p in directives.split(","):
            p = p.strip().lower()
            if p == "none":
                self.index = False
                self.follow = False
            elif p == "noindex":
                self.index = False
            elif p == "nofollow":
                self.follow = False
            # "all"/"index"/"follow" never relax an earlier restriction


# ---------------------------------------------------------------------------
# HTML head extraction
# ---------------------------------------------------------------------------

class _HeadParser(HTMLParser):
    """Single-pass extraction mirroring SetContent (document.go:218-345)."""

    def __init__(self, doc_id: str, base_url: str,
                 truncate_title: int = TRUNCATE_TITLE,
                 truncate_keywords: int = TRUNCATE_KEYWORDS,
                 truncate_description: int = TRUNCATE_DESCRIPTION,
                 collect_links: bool = True):
        super().__init__(convert_charrefs=True)
        self.doc_id = doc_id
        self.base_url = base_url
        self.collect_links = collect_links
        self.truncate_title = truncate_title
        self.truncate_keywords = truncate_keywords
        self.truncate_description = truncate_description
        self.in_title = False
        self.title = ""
        self.keywords = ""
        self.description = ""
        self.lang_attr: str | None = None
        self.canonical: str = ""
        self.policy = Policy()
        self.links: list[str] = []
        self.images: list[tuple[str, str]] = []

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _attr(attrs, key):
        for k, v in attrs:
            if k == key:
                return v if v is not None else ""
        return None

    # -- tag handlers -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            lang = self._attr(attrs, "lang")
            if lang:
                self.lang_attr = lang
        elif tag == "title":
            self.in_title = True
        elif tag == "link":
            if self._attr(attrs, "rel") == "canonical":
                lnk = self._attr(attrs, "href") or ""
                if lnk != self.doc_id:
                    self.canonical = lnk
                    self.links.append(lnk)
        elif tag == "meta":
            name = self._attr(attrs, "name")
            if name == "keywords":
                kw = self._attr(attrs, "content")
                if kw is not None:
                    words = kw.replace(",", " ").split()
                    words = gourl.remove_duplicates(words)
                    if len(words) > self.truncate_keywords:
                        words = words[:self.truncate_keywords]
                    self.keywords = extract_text(" ".join(words), -1)
            if name == "description":
                des = self._attr(attrs, "content")
                if des is not None:
                    self.description = extract_text(des, self.truncate_description)
            if name is not None and name.lower() == "robots":
                content = self._attr(attrs, "content") or ""
                self.policy.apply(content)
        elif tag == "a":
            # link resolution is crawl-frontier work (urljoin per <a> is
            # ~30% of extraction); the batch index build skips it
            if self.collect_links and self.policy.follow:
                rel = self._attr(attrs, "rel") or ""
                if "nofollow" not in [r.strip().lower() for r in rel.split()]:
                    href = self._attr(attrs, "href")
                    if href:
                        u = gourl.handle_link(self.base_url, href)
                        if u:
                            self.links.append(u)
        elif tag == "img":
            if self.collect_links:
                src = self._attr(attrs, "src")
                if src:
                    u = gourl.handle_link(self.base_url, src)
                    if u:
                        self.images.append((u, self._attr(attrs, "alt") or ""))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "title":
            self.in_title = False

    def handle_data(self, data):
        if self.in_title:
            # Go assigns per text token — the last one wins (document.go:232-235)
            self.title = extract_text(data, self.truncate_title)


@dataclass
class ExtractedDoc:
    """Flat extraction result — one row of the docs table."""

    url: str = ""
    scheme: str = ""
    host: str = ""
    domain: str = ""
    tld: str = ""
    path_parts: str = ""
    title: str = ""
    keywords: str = ""
    description: str = ""
    lang: str = "en"
    mime: str = ""
    index: bool = True
    follow: bool = True
    canonical: bool = True
    canonical_url: str = ""
    links: list[str] = field(default_factory=list)
    valid: bool = True
    error: str = ""

    @property
    def text(self) -> str:
        """The indexed text: head fields ⊕ URL fields, space-joined."""
        parts = [self.title, self.keywords, self.description, self.domain, self.path_parts]
        return " ".join(p for p in parts if p)


def extract_page(link: str, html_bytes: bytes | None,
                 truncate_title: int = TRUNCATE_TITLE,
                 truncate_keywords: int = TRUNCATE_KEYWORDS,
                 truncate_description: int = TRUNCATE_DESCRIPTION,
                 collect_links: bool = True) -> ExtractedDoc:
    """Full per-page extraction: URL derivation (document.New,
    document.go:65-87) + MIME/charset + head extraction (SetContent)."""
    out = ExtractedDoc()
    try:
        u = gourl.validate_url(link)
        out.url = u.string()
        out.scheme = u.scheme
        out.host = u.host
        out.domain = psl.effective_tld_plus_one(u.host)
        out.tld = psl.tld_of(out.domain)
        out.path_parts = gourl.path_parts(u.path)
    except (gourl.URLError, psl.DomainError, ValueError) as e:
        out.valid = False
        out.error = str(e)
        out.url = link
        return out

    if not html_bytes:
        return out

    out.mime = detect_mime(html_bytes)
    if out.mime not in ("text/html", "text/plain", "text/xml"):
        # crawler keeps only these (crawler.go:291-293); others → stub
        out.index = False
        return out

    text = decode_html(html_bytes)
    parser = _HeadParser(out.url, out.url, truncate_title, truncate_keywords,
                         truncate_description, collect_links)
    try:
        parser.feed(text)
        parser.close()
    except Exception as e:  # malformed HTML: keep what was extracted
        out.error = f"parse: {e}"

    out.title = parser.title
    out.keywords = parser.keywords
    out.description = parser.description
    out.lang = match_language(parser.lang_attr)
    out.index = parser.policy.index
    out.follow = parser.policy.follow
    out.canonical_url = parser.canonical
    out.canonical = not (parser.canonical and parser.canonical != out.url)
    out.links = parser.links
    return out


# ---------------------------------------------------------------------------
# Spark surface — Arrow-batched extraction over the pages table
# ---------------------------------------------------------------------------

#: Spark schema of the extraction output (stub columns always present;
#: noindex/non-canonical rows keep only identity fields, mirroring the
#: reference's stub projection, crawler.go:311-322).
EXTRACT_SCHEMA = (
    "url string, scheme string, host string, domain string, tld string, "
    "path_parts string, title string, keywords string, description string, "
    "lang string, mime string, index boolean, follow boolean, "
    "canonical boolean, canonical_url string, text string, valid boolean"
)


def extract_pages_df(pages_df, stub_noindex: bool = True,
                     collect_links: bool = True):
    """pages(url, warc_ts, html, …) → extracted docs DataFrame.

    Runs the extractor as an Arrow-batched ``mapInPandas`` (one Python
    invocation per ~10k-row batch, never a per-row Python UDF), keeping
    url + warc_ts and appending all extracted columns. At cluster scale
    this is a narrow map — no shuffle; Catalyst prunes untouched
    columns out of the parquet scan.
    """
    import pandas as pd  # noqa: F401  (executor-side import)

    from .session import ensure_shipped
    ensure_shipped(pages_df.sparkSession)

    out_schema = "url string, warc_ts timestamp, " + EXTRACT_SCHEMA.replace("url string, ", "", 1)

    def _extract_batches(batches):
        for pdf in batches:
            rows = []
            for link, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                d = extract_page(link, bytes(html) if html is not None else None,
                                 collect_links=collect_links)
                if stub_noindex and (not d.index or not d.canonical):
                    # stub projection: identity fields only (crawler.go:311-322)
                    rows.append((d.url, ts, d.scheme, d.host, "", "", "", "", "",
                                 "", d.lang, d.mime, d.index, d.follow,
                                 d.canonical, d.canonical_url, "", d.valid))
                else:
                    rows.append((d.url, ts, d.scheme, d.host, d.domain, d.tld,
                                 d.path_parts, d.title, d.keywords,
                                 d.description, d.lang, d.mime, d.index,
                                 d.follow, d.canonical, d.canonical_url,
                                 d.text, d.valid))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "scheme", "host", "domain", "tld",
                         "path_parts", "title", "keywords", "description",
                         "lang", "mime", "index", "follow", "canonical",
                         "canonical_url", "text", "valid"],
            )

    return pages_df.select("url", "warc_ts", "html").mapInPandas(_extract_batches, schema=out_schema)
