"""UMLS 3-letter ↔ ISO-2 language code mapping
(reference ontology/umls/UMLSLanguageCode.java:4-27).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# UMLS LAT → ISO-639-1 (the pairs enumerated by the reference enum)
UMLS_TO_ISO2: dict[str, str] = {
    "ENG": "en", "FRE": "fr", "GER": "de", "SPA": "es", "ITA": "it",
    "POR": "pt", "DUT": "nl", "SWE": "sv", "FIN": "fi", "NOR": "no",
    "DAN": "da", "POL": "pl", "HUN": "hu", "CZE": "cs", "RUS": "ru",
    "JPN": "ja", "CHI": "zh", "KOR": "ko", "TUR": "tr", "HEB": "he",
    "BAQ": "eu", "EST": "et", "GRE": "el", "LAV": "lv", "SCR": "hr",
}
ISO2_TO_UMLS: dict[str, str] = {v: k for k, v in UMLS_TO_ISO2.items()}


def _mapper(mapping: dict[str, str], col: Column) -> Column:
    expr = F.lit(None).cast("string")
    # reversed so the earliest dict entry wins (irrelevant: keys unique)
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def umls_to_iso2(lat: Column) -> Column:
    """``ENG`` → ``en`` (null for unknown codes, like the enum's null)."""
    return _mapper(UMLS_TO_ISO2, lat)


def iso2_to_umls(lang: Column) -> Column:
    """``en`` → ``ENG``."""
    return _mapper(ISO2_TO_UMLS, lang)
