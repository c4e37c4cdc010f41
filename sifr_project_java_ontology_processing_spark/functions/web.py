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
  2. lowercase the scheme and authority (never the path/query);
  3. drop explicit default ports (``http://h:80``, ``https://h:443``);
  4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) and
     tidy the leftover ``?``/``&`` separators;
  5. drop a single trailing slash after a non-empty path segment.
Relative/garbage inputs (no ``scheme://authority`` prefix) pass through
rules 1/4/5 only — never mangled by host lowering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ABS_PREFIX = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
TRACKING_PARAM_RX = r"(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&]*&?"


def normalize_url(url: Column) -> Column:
    """Canonical URL key; see module docstring for the rule list."""
    s = F.regexp_replace(url, r"#.*", "")
    head = F.lower(F.regexp_extract(s, _ABS_PREFIX, 1))
    tail = F.regexp_replace(s, _ABS_PREFIX, "")
    s = F.when(head == "", s).otherwise(F.concat(head, tail))
    s = F.regexp_replace(s, r"^(http://[^/:?#]*):80((/|\?).*)?$", "$1$2")
    s = F.regexp_replace(s, r"^(https://[^/:?#]*):443((/|\?).*)?$", "$1$2")
    s = F.regexp_replace(s, TRACKING_PARAM_RX, "")
    s = F.regexp_replace(s, r"[?&]$", "")
    s = F.regexp_replace(s, r"([^/])/$", "$1")
    return s


def url_host(url: Column) -> Column:
    """Lowercased authority (host[:port]) of an absolute URL, '' when
    the input has no ``scheme://`` prefix. Companion key for per-host
    aggregation (crawl politeness stats, host-level dedup)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
