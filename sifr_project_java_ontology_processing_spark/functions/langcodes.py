"""UMLS 3-letter ↔ short language code mapping
(reference ontology/umls/UMLSLanguageCode.java:4-27).

Bug-compat: the reference enum's shortCodes are NOT all ISO-639-1 —
it ships ``CZE→cz``, ``JPN→jp``, ``SWE→sw``, ``KOR→kr`` (the ISO codes
would be cs/ja/sv/ko) and has no CHI/TUR/EST/GRE entries at all. We
reproduce the enum exactly so lang tags round-trip against
reference-produced data; the reverse mapping additionally accepts the
ISO-correct spellings as input aliases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# UMLS LAT → reference shortCode, byte-for-byte the 21 enum pairs
# (UMLSLanguageCode.java:6-26).
UMLS_TO_SHORT: dict[str, str] = {
    "ENG": "en", "FRE": "fr", "CZE": "cz", "FIN": "fi", "GER": "de",
    "ITA": "it", "JPN": "jp", "POL": "pl", "POR": "pt", "RUS": "ru",
    "SPA": "es", "SWE": "sw", "SCR": "hr", "DUT": "nl", "LAV": "lv",
    "HUN": "hu", "KOR": "kr", "DAN": "da", "NOR": "no", "HEB": "he",
    "BAQ": "eu",
}
# Backwards-compat name used elsewhere in the package.
UMLS_TO_ISO2 = UMLS_TO_SHORT

SHORT_TO_UMLS: dict[str, str] = {v: k for k, v in UMLS_TO_SHORT.items()}
# ISO-639-1 aliases for the enum's non-ISO shortCodes (input side only).
_ISO_ALIASES: dict[str, str] = {"cs": "CZE", "ja": "JPN", "sv": "SWE", "ko": "KOR"}
ISO2_TO_UMLS: dict[str, str] = {**SHORT_TO_UMLS, **_ISO_ALIASES}


def _mapper(mapping: dict[str, str], col: Column) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def umls_to_iso2(lat: Column) -> Column:
    """``ENG`` → ``en`` (reference shortCode; null for unknown LATs,
    mirroring the enum's absence of e.g. CHI/TUR)."""
    return _mapper(UMLS_TO_SHORT, lat)


def iso2_to_umls(lang: Column) -> Column:
    """``en`` → ``ENG``; accepts both the reference's legacy shortCodes
    (``cz``, ``jp``, ``sw``, ``kr``) and the ISO-correct spellings."""
    return _mapper(ISO2_TO_UMLS, lang)
