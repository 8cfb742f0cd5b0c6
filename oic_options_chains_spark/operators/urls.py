"""URL canonicalization for crawl curation — pure JVM column ops.

A web-crawl corpus dedups and rates documents by CANONICAL URL, not the
raw string: the same page arrives as ``HTTP://WWW.Example.com:80/a/``,
``http://example.com/a/?utm_source=x``, and ``http://example.com/a/#top``.
Everything here is regexp/split/filter/sort column arithmetic (no
Python, no java.net.URL — its semantics differ from a SQL oracle's),
so the canonical key is computable identically by any engine:

- scheme and host lowercase; ``www.`` prefix stripped,
- default ports dropped (``:80`` for http, ``:443`` for https),
- fragment dropped,
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
- surviving query params sorted bytewise and re-joined,
- empty path normalized to ``/``.

``registered_domain`` is the last two host labels — the policy-free
approximation (a real deploy swaps in the public-suffix list at the
same seam; the column contract is unchanged).

Scale: row-local expressions — whole-stage codegen, no shuffle; a
canonical-URL dedup is then the ordinary hash groupBy every exact-dedup
path here uses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the split regex keeps this list in ONE place for Spark and tests;
# oracles inline the same alternation
TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "ref")
_TRACK_RE = "^(" + "|".join(TRACKING_PARAMS) + ")="

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def url_parts(url: Column) -> dict[str, Column]:
    """(scheme, host, port, path, query, fragment) via one anchored
    regexp — NULL scheme/host marks a non-URL (callers quarantine).
    Port is split from the authority; userinfo is not supported (NULL
    scheme for ``user@host`` forms keeps the contract conservative)."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    authority = F.regexp_extract(url, _URL_RE, 2)
    ok = (scheme != "") & (authority != "") & ~authority.contains("@")
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)(:\d+)?$", 1))
    port = F.regexp_extract(authority, r"^[^:]*:(\d+)$", 1)
    path = F.regexp_extract(url, _URL_RE, 3)
    query = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?'
    frag = F.regexp_extract(url, _URL_RE, 5)
    return {
        "scheme": F.when(ok, scheme),
        "host": F.when(ok & (host != ""), host),
        "port": F.when(ok & (port != ""), port.cast("int")),
        "path": F.when(ok, path),
        "query": F.when(ok & (query != ""), F.substring(query, 2, 1 << 20)),
        "fragment": F.when(ok & (frag != ""), F.substring(frag, 2, 1 << 20)),
    }


def canonical_url(url: Column) -> Column:
    """The canonical form, NULL for non-URLs. Deterministic: parameter
    order is a bytewise array_sort of the surviving ``k=v`` strings."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    default_port = (
        (p["scheme"] == "http") & (p["port"] == 80)
    ) | ((p["scheme"] == "https") & (p["port"] == 443))
    port_part = F.when(
        p["port"].isNotNull() & ~default_port,
        F.concat(F.lit(":"), p["port"].cast("string")),
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    kept = F.filter(
        F.split(F.coalesce(p["query"], F.lit("")), "&"),
        lambda kv: (kv != "") & ~kv.rlike(_TRACK_RE),
    )
    query_part = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
    ).otherwise(F.lit(""))
    return F.when(
        p["host"].isNotNull(),
        F.concat(p["scheme"], F.lit("://"), host, port_part, path, query_part),
    )


def registered_domain(url: Column) -> Column:
    """Last two labels of the canonical host (``a.b.example.com`` ->
    ``example.com``) — the grouping key for per-domain corpus stats."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        p["host"].isNotNull(),
        F.when(
            n <= 2, host
        ).otherwise(
            F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
        ),
    )
