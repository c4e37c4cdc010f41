"""URL canonicalization for web-scale corpus keys (training-data
pipeline mandate; generalizes the reference's path/URL name handling,
ontology/BaseOntologyDelegate.java:74-107, to page URLs).

At 10^12 documents the page URL is the primary key for exact dedup,
lineage and resume — but crawls carry the same resource under many
spellings (case-variant hosts, default ports, tracking params,
fragments, trailing slashes). ``normalize_url`` maps those spellings to
one canonical key with PURE column expressions (whole-stage codegen, no
UDF), so it pushes through scans for free.

Every rewrite is a regex with identical semantics in Java regex (Spark)
and RE2 (DuckDB) — no lookaround, no engine-specific classes — so the
oracle can replay it (`url_normalize` registry query).

Rules, in order:
  1. drop the fragment (``#...``);
  2. lowercase the scheme and host[:port]; userinfo (``user:pw@``) is
     case-SENSITIVE per RFC 3986 and is preserved;
  3. drop explicit default ports (``http://h:80``, ``https://h:443``);
  4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) —
     whole-name matches only, anchored at a ``?``/``&`` separator, so
     ``myfbclid=x`` or a path segment ``/fbclid=5/`` is never touched
     (a literal ``&name=`` inside a PATH would still match; split-path
     parsing is the heavier fix if such paths ever matter);
  5. drop a single trailing slash after a non-empty path segment —
     only when the URL has no query string (never mutates a query
     value like ``?next=/home/``).
Relative/garbage inputs (no ``scheme://authority`` prefix) pass through
rules 1/4/5 only — never mangled by host lowering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*://)"
_ABS_PREFIX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# tracking params: name anchored at the separator, full name match
_TRACK_NAMES = r"(utm_[a-zA-Z0-9_]+|gclid|fbclid)"
TRACKING_MID_RX = rf"&{_TRACK_NAMES}=[^&]*"
TRACKING_FIRST_RX = rf"\?{_TRACK_NAMES}=[^&]*&?"


def normalize_url(url: Column) -> Column:
    """Canonical URL key; see module docstring for the rule list."""
    s = F.regexp_replace(url, r"#.*", "")
    # rule 2: lowercase scheme + host[:port], preserve userinfo case
    scheme = F.regexp_extract(s, _SCHEME, 1)
    userinfo = F.regexp_extract(s, rf"{_SCHEME[:-1]})([^/?#]*@)", 2)
    hostport = F.regexp_extract(s, rf"{_SCHEME[:-1]})(?:[^/?#]*@)?([^/?#]*)", 2)
    tail = F.regexp_replace(s, _ABS_PREFIX, "")
    s = F.when(scheme == "", s).otherwise(
        F.concat(F.lower(scheme), userinfo, F.lower(hostport), tail)
    )
    # optional userinfo before the host: 'http://user:pw@h:80/x' must
    # strip its default port too, or it splits from 'http://user:pw@h/x'
    s = F.regexp_replace(s, r"^(http://(?:[^/?#]*@)?[^/:?#]*):80((/|\?).*)?$", "$1$2")
    s = F.regexp_replace(
        s, r"^(https://(?:[^/?#]*@)?[^/:?#]*):443((/|\?).*)?$", "$1$2"
    )
    # rule 4: non-first params, then a first param (promoting the next
    # separator), then a dangling '?'
    s = F.regexp_replace(s, TRACKING_MID_RX, "")
    s = F.regexp_replace(s, TRACKING_FIRST_RX, "?")
    s = F.regexp_replace(s, r"[?]$", "")
    # rule 5: whole string must be query-free ([^?]*) for the strip
    s = F.regexp_replace(s, r"^([^?]*[^/?])/$", "$1")
    return s


def url_host(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL (userinfo excluded),
    '' when the input has no ``scheme://`` prefix. Companion key for
    per-host aggregation (crawl politeness stats, host-level dedup)."""
    return F.lower(
        F.regexp_extract(url, rf"{_SCHEME[:-1]})(?:[^/?#]*@)?([^/?#]*)", 2)
    )


# --- PII scrubbing (corpus hygiene before training) ---------------------
# RE2-compatible (no \b, no lookaround) so the DuckDB oracle replays the
# exact rewrites. Deliberate approximations are documented per pattern.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted quad; without \b this also matches inside longer dotted runs —
# acceptable for redaction (over-redacts, never leaks)
PII_IPV4_RX = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
# 9+ digit runs (phone-ish / account-ish); spaces/dashes not joined
PII_LONGNUM_RX = r"[0-9]{9,}"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ipv4, n_longnums) found in ``text`` — counted BEFORE
    redaction, pure codegen (regexp_count)."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_RX)),
        F.regexp_count(text, F.lit(PII_IPV4_RX)),
        F.regexp_count(text, F.lit(PII_LONGNUM_RX)),
    )


def scrub_pii(text: Column) -> Column:
    """Redact emails → ``<EMAIL>``, dotted quads → ``<IP>``, 9+-digit
    runs → ``<NUM>`` (applied in that order: emails may contain digits
    and dots, so they are replaced before the narrower patterns)."""
    s = F.regexp_replace(text, PII_EMAIL_RX, "<EMAIL>")
    s = F.regexp_replace(s, PII_IPV4_RX, "<IP>")
    s = F.regexp_replace(s, PII_LONGNUM_RX, "<NUM>")
    return s
