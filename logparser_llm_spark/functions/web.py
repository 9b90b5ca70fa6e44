"""URL hygiene for web corpora: canonicalization, host and registrable
domain extraction.

Web-scale dedup and per-site capping both key on URLs, and raw crawl
URLs disagree on case, default ports, tracking parameters and fragments
— the same page appears under dozens of spellings. The canonicalizer is
a pure JVM-side column expression chain (regexp_extract/replace — no
Python in the hot path, fully codegen'd), applying the standard
normalizations in a fixed order:

1. trim surrounding whitespace;
2. lowercase the scheme and authority ONLY (paths are case-sensitive
   per RFC 3986 — ``/Articles`` must survive);
3. drop a default port (``:80`` for http, ``:443`` for https);
4. drop the fragment (``#...`` — never sent to the server);
5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``mc_cid``, ``mc_eid``, bare ``ref``) and tidy the leftovers
   (``?&`` → ``?``, ``&&`` → ``&``, trailing ``?``/``&`` removed).

``registrable_domain`` approximates the public-suffix list with the
common multi-part second levels (``co.uk``-style): the full PSL is a
data file, not an algorithm, so it is out of scope here — the function
is exact for generic TLDs and the usual ccTLD patterns, and says so.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_PARAMS = ("utm_[a-z]+", "gclid", "fbclid", "mc_cid", "mc_eid", "ref")

# second-level labels that act as public suffixes under 2-letter ccTLDs
_MULTIPART_SECOND = ("co", "com", "net", "org", "ac", "gov", "edu", "or", "ne")

_AUTHORITY_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` (steps 1-5 above), as one JVM
    expression chain. Inputs without a ``scheme://authority`` head skip
    the case/port steps and still get fragment/tracking cleanup."""
    u0 = F.trim(url)
    head = F.regexp_extract(u0, _AUTHORITY_RE, 0)
    rest = u0.substr(F.length(head) + F.lit(1), F.length(u0))
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"#.*$", "")
    pat = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, rf"([?&])({pat})=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    return u


def host_of(url: Column) -> Column:
    """Lowercased host (no scheme, userinfo, port, path)."""
    auth = F.lower(F.regexp_extract(F.trim(url), _AUTHORITY_RE, 0))
    return F.regexp_replace(
        F.regexp_replace(auth, r"^[a-z][a-z0-9+.-]*://", ""),
        r"(^.*@)|(:\d+$)",
        "",
    )


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a host: last two labels, or last three
    when the second-to-last label is a common public-suffix second
    level under a 2-letter ccTLD (``b.co.uk`` from ``a.b.co.uk``).
    Hosts with fewer labels pass through unchanged."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    last2 = F.element_at(parts, -2)
    two = F.concat_ws(".", last2, last1)
    three = F.concat_ws(".", F.element_at(parts, -3), last2, last1)
    is_multi = (F.length(last1) == 2) & last2.isin(*_MULTIPART_SECOND)
    return (
        F.when(n <= 2, host)
        .when((n >= 3) & is_multi, three)
        .otherwise(two)
    )


def surt_key(url: Column) -> Column:
    """CDX-style sort key ("urlkey") of a URL — the Sort-friendly URI
    Reordering Transform used by Common Crawl's CDX index files and the
    wayback tooling conventions: host labels reversed and comma-joined
    (so one registrable domain's pages sort contiguously), ``)`` then
    the path+query; everything lowercased; scheme, userinfo, default
    port, fragment and tracking parameters dropped (via
    :func:`canonicalize_url`); a leading ``www.`` label dropped; query
    parameters sorted bytewise so equivalent urls with permuted
    arguments share one key; a NON-default port is kept after the
    reversed host (``com,example:8080)/``) since it names a distinct
    origin.

    ``https://WWW.News.Example.com:443/A/B?b=2&a=1#x`` →
    ``com,example,news)/a/b?a=1&b=2``.

    Pure JVM expression chain — at crawl scale the key is computed in
    the scan stage and the index is one sort on it. Sort keys only:
    path case is intentionally folded (unlike :func:`canonicalize_url`,
    which preserves it for fetchability). Schemeless inputs yield a
    key with an empty host part (total, never raises).

    The lowercase happens BEFORE canonicalization so the (case-
    sensitive) tracking-param strip sees ``utm_`` however the crawl
    spelled it — ``?UTM_SOURCE=x`` must collapse to the same key as
    ``?utm_source=x`` (canonicalize_url itself keeps the raw case
    because its output must stay fetchable; sort keys have no such
    constraint)."""
    u = canonicalize_url(F.lower(url))
    host = host_of(u)
    host = F.regexp_replace(host, r"^www\.", "")
    revhost = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    # canonicalize_url already stripped DEFAULT ports; whatever port
    # survives names a distinct origin and stays in the key
    port = F.regexp_extract(F.regexp_extract(u, _AUTHORITY_RE, 0), r":(\d+)$", 1)
    revhost = F.concat(
        revhost,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    rest = F.regexp_replace(u, _AUTHORITY_RE, "")
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        revhost,
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
