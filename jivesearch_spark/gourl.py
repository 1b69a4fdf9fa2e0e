"""Go `net/url`-compatible URL handling (pinned subset).

Replicates the URL semantics the reference engine relies on:

- ``validate_url`` — reference ``document.ValidateURL``
  (/root/reference/search/document/document.go:91-111): parse, strip
  fragment, require http/https, lowercase host, and return the
  canonical string exactly as Go's ``(*url.URL).String()`` renders it
  (including Go's path re-escaping rules, e.g. ``<`` → ``%3C`` while
  ``$&+,/:;=@`` stay literal in paths).
- ``handle_link`` — reference ``document.handleLink``
  (/root/reference/search/document/document.go:393-419): length gate
  3..2083, relative-reference resolution, http(s)-only, != self.
- ``path_parts`` — reference ``document.path``
  (/root/reference/search/document/document.go:124-131).

Everything here is pure Python (stdlib only) so it can run inside
Arrow-batched pandas UDFs on executors with zero extra dependencies.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+\-.]*):(.*)$", re.DOTALL)

# Characters Go's net/url leaves unescaped in a path when re-encoding
# (shouldEscape(c, encodePath) == false): RFC 3986 unreserved plus the
# reserved set "$&+,/:;=@" ("?" is escaped in paths).
_PATH_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-_.~$&+,/:;=@"
)

# validEncoded(s, encodePath) additionally tolerates these if they were
# present in the original raw path (Go net/url url.go validEncoded).
_PATH_VALID_EXTRA = set("!$&'()*+,;=:@[]%")

_HEX = "0123456789ABCDEF"


class URLError(ValueError):
    """Raised for URLs the reference would reject."""


def _escape_path(path: str) -> str:
    """Go url.escape(path, encodePath) over the UTF-8 bytes."""
    out = []
    for b in path.encode("utf-8"):
        c = chr(b)
        if c in _PATH_SAFE:
            out.append(c)
        else:
            out.append("%" + _HEX[b >> 4] + _HEX[b & 0xF])
    return "".join(out)


def _valid_encoded_path(raw: str) -> bool:
    """Go url.validEncoded(raw, encodePath)."""
    for c in raw:
        if c in _PATH_VALID_EXTRA:
            continue
        if c not in _PATH_SAFE:
            return False
    return True


def _unescape(s: str) -> str:
    """Percent-decode; raises URLError on malformed %XX like Go."""
    if "%" not in s:
        return s
    out = bytearray()
    i = 0
    raw = s.encode("utf-8")
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0x25:  # '%'
            if i + 2 >= n + 1 or i + 2 > n - 1:
                raise URLError(f"invalid URL escape {s[i:i+3]!r}")
            try:
                out.append(int(raw[i + 1 : i + 3].decode("ascii"), 16))
            except ValueError as e:
                raise URLError(f"invalid URL escape {s[i:i+3]!r}") from e
            i += 3
        else:
            out.append(b)
            i += 1
    return out.decode("utf-8", errors="surrogateescape")


class GoURL:
    """Minimal analogue of Go's url.URL for the fields the engine uses."""

    __slots__ = ("scheme", "host", "path", "raw_path", "raw_query")

    def __init__(self, scheme: str, host: str, path: str, raw_path: str, raw_query: str):
        self.scheme = scheme
        self.host = host
        self.path = path
        self.raw_path = raw_path
        self.raw_query = raw_query

    def escaped_path(self) -> str:
        if self.raw_path and _valid_encoded_path(self.raw_path):
            try:
                if _unescape(self.raw_path) == self.path:
                    return self.raw_path
            except URLError:
                pass
        return _escape_path(self.path)

    def string(self) -> str:
        """Go (*url.URL).String() for scheme://host/path?query URLs."""
        buf = []
        if self.scheme:
            buf.append(self.scheme + ":")
        if self.host or self.scheme:
            buf.append("//")
            buf.append(self.host)
        p = self.escaped_path()
        if p and not p.startswith("/") and self.host:
            buf.append("/")
        buf.append(p)
        if self.raw_query:
            buf.append("?" + self.raw_query)
        return "".join(buf)


def parse(raw: str) -> GoURL:
    """Go url.Parse subset: fragment split, scheme, authority, path, query.

    The fragment is split off and *discarded* (the reference always
    strips it before anything else, document.go:96-99).
    """
    # fragment: everything from the first '#'
    hash_idx = raw.find("#")
    if hash_idx >= 0:
        raw = raw[:hash_idx]

    scheme = ""
    rest = raw
    m = _SCHEME_RE.match(raw)
    if m and m.group(1):
        scheme = m.group(1).lower()
        rest = m.group(2)

    raw_query = ""
    q_idx = rest.find("?")
    if q_idx >= 0:
        rest, raw_query = rest[:q_idx], rest[q_idx + 1 :]

    host = ""
    if rest.startswith("//"):
        authority = rest[2:]
        slash = authority.find("/")
        if slash >= 0:
            host, rest = authority[:slash], authority[slash:]
        else:
            host, rest = authority, ""

    raw_path = rest
    path = _unescape(raw_path)
    # Go setPath: RawPath kept only when it differs from the re-escape.
    stored_raw = raw_path if _escape_path(path) != raw_path else ""
    return GoURL(scheme, host, path, stored_raw, raw_query)


def validate_url(lnk: str) -> GoURL:
    """Reference ValidateURL (document.go:91-111).

    Strips the fragment, requires http/https, lowercases the host.
    Returns the GoURL; ``.string()`` is the document ID.
    """
    u = parse(lnk)
    if u.scheme not in ("http", "https"):
        raise URLError("invalid scheme")
    u.host = u.host.lower()
    return u


def path_parts(p: str) -> str:
    """Reference path() (document.go:124-131).

    Replace '/' and '-' with spaces, strip a trailing .html/.htm/.php,
    whitespace-split, dedup preserving order, space-join.
    """
    path = p.replace("/", " ").replace("-", " ")
    # Go runs TrimSuffix for each ext in order (no early exit), so e.g.
    # "a.php.html" → "a.php" → "a".
    for ext in (".html", ".htm", ".php"):
        if path.endswith(ext):
            path = path[: -len(ext)]
    return " ".join(remove_duplicates(path.split()))


def remove_duplicates(words: list[str]) -> list[str]:
    """Reference removeDuplicates (document.go:370-382): order-preserving."""
    seen = set()
    out = []
    for w in words:
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def handle_link(base_url: str, href: str) -> str | None:
    """Reference handleLink (document.go:393-419).

    Returns the resolved absolute URL string, or None when the
    reference would reject it (too short/long, non-http(s), == self).
    """
    if href is None or len(href) < 3 or len(href) > 2083:
        return None
    try:
        resolved = urljoin(base_url, href)
        u = parse(resolved)
    except (URLError, ValueError):
        return None
    if u.scheme not in ("http", "https"):
        return None
    s = u.string()
    if s == base_url:
        return None
    return s
