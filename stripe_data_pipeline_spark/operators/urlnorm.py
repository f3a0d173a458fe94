"""RFC 3986 URL canonicalization (r13, VERDICT r12 #5) — the missing
step of the crawl head between WARC ingestion (sources/warc_source.py)
and robots filtering (operators/robots.py): dedup
``http://x.example/a/../b?utm_source=…`` against
``http://x.example/b`` BEFORE fetch scheduling, so the frontier never
re-crawls a page it already holds under a cosmetically different URL.

Everything is a chain of JVM ``regexp_replace``/``regexp_extract``
expressions in the Java/RE2-COMMON regex subset (no lookaround, no
backreference matching — only capture-group SUBSTITUTION, which both
engines support with their own replacement syntax), so the same rules
are restatable in a DuckDB oracle and the whole normalizer runs at
scan speed inside WholeStageCodegen: zero Python, zero shuffle, cost
is one narrow projection per URL column at any corpus size.

Normalization rules (the RFC 3986 §6 + de-facto tracking-param set):
  1. strip the fragment (``#…`` — never sent to the server);
  2. lowercase the scheme and authority (case-insensitive per RFC);
  3. drop default ports (``https…:443``, ``http…:80``);
  4. resolve ``/./`` and ``/seg/../`` dot-segments (bounded: ``rounds``
     replacement passes, each pass resolving one nesting level — pass
     a higher ``rounds`` for pathological ``a/b/c/../../../`` chains);
  5. strip tracking query params (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``) and any delimiter debris they leave behind.

Deliberately NOT done (documented non-goals, matching the conservative
canonicalizers in production crawlers): percent-encoding
re-normalization (%41 -> A) — url_decode would also decode reserved
characters and merge distinct URLs; query-param REORDERING — param
order can be semantic; trailing-slash addition — ``/p`` and ``/p/``
are distinct resources."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the de-facto tracking parameters every crawler strips
_TRACKING = "(utm_[a-z0-9]+|fbclid|gclid|msclkid)"

# A real path segment: any run of non-delimiter chars EXCEPT exactly
# "." or ".." — spelled as an alternation (starts with a non-dot; or
# "." then a non-dot; or ".." then at least one more char) because the
# RE2-common subset has no lookahead to say "not followed by". Without
# this, "/../../" would match the unwind pattern with ".." itself as
# the segment and chained parent references would unwind INTO each
# other instead of consuming one real segment each.
_SEG = "([^/.?#][^/?#]*|\\.[^/.?#][^/?#]*|\\.\\.[^/?#]+)"


def canonicalize_url(url: Column, rounds: int = 4) -> Column:
    """Canonical form of ``url`` as a pure JVM expression column."""
    u = F.trim(url)
    # 1. fragment
    u = F.regexp_replace(u, "#.*", "")
    # 2. lowercase scheme://authority (path/query case is preserved —
    #    paths are case-sensitive per RFC 3986)
    head = F.lower(F.regexp_extract(u, "^([^/?#]*//[^/?#]*)", 1))
    tail = F.regexp_replace(u, "^[^/?#]*//[^/?#]*", "")
    u = F.concat(head, tail)
    # 3. default ports ($1$2 capture substitution, no lookahead)
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443($|[/?#].*)", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    for _ in range(max(1, rounds)):
        # 4. dot segments: /./ collapses; /seg/../ unwinds one level
        u = F.regexp_replace(u, "/\\./", "/")
        u = F.regexp_replace(u, f"/{_SEG}/\\.\\./", "/")
        # 5. tracking param followed by another param: keep the
        #    delimiter for the successor
        u = F.regexp_replace(u, f"([?&]){_TRACKING}=[^&#]*&", "$1")
    # trailing dot segments (path ends at the segment)
    u = F.regexp_replace(u, "/\\.$", "/")
    u = F.regexp_replace(u, f"/{_SEG}/\\.\\.$", "/")
    # 5b. tracking param in final position: its own delimiter goes too
    u = F.regexp_replace(u, f"[?&]{_TRACKING}=[^&#]*$", "")
    # delimiter debris: a now-empty query
    u = F.regexp_replace(u, "\\?$", "")
    return u
