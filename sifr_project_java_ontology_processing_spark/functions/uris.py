"""URI / prefix handling (SURVEY.md F5, F9, F10).

The reference expands prefixes dynamically through a Jena PrefixMapping
loaded from ``prefixes.ttl`` (reference: ontology/prefix/OntologyPrefix.java:43-48,
src/main/resources/prefixes.ttl:1-9). Here prefix expansion is a
plan-construction-time dict — URIs land in DataFrames as literal values,
so there is no runtime cost at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIXES: dict[str, str] = {
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "umls": "http://bioportal.bioontology.org/ontologies/umls/",
    "gold": "http://purl.org/linguistics/gold/",
    "sifr": "http://purl.lirmm.fr/ontology/SIFR/",
}

# STY URI base (reference: cuis/CUIOntologyDelegateImpl.java:62-68)
STY_BASE = "http://purl.lirmm.fr/ontology/STY/"


def expand(curie: str) -> str:
    """``skos:prefLabel`` → full URI (F9). Plain strings pass through."""
    if ":" in curie:
        prefix, local = curie.split(":", 1)
        base = PREFIXES.get(prefix)
        if base is not None and not local.startswith("//"):
            return base + local
    return curie


# Common predicate URIs as module constants (plan-time literals).
RDF_TYPE = expand("rdf:type")
RDFS_SUBCLASSOF = expand("rdfs:subClassOf")
OWL_CLASS = expand("owl:Class")
OWL_SAMEAS = expand("owl:sameAs")
SKOS_CONCEPT = expand("skos:Concept")
SKOS_PREF_LABEL = expand("skos:prefLabel")
SKOS_ALT_LABEL = expand("skos:altLabel")
SKOS_HIDDEN_LABEL = expand("skos:hiddenLabel")
SKOS_NOTATION = expand("skos:notation")
SKOS_CHANGE_NOTE = expand("skos:changeNote")
SKOS_BROADER = expand("skos:broader")
SKOS_IN_SCHEME = expand("skos:inScheme")
SKOS_HAS_TOP_CONCEPT = expand("skos:hasTopConcept")
UMLS_CUI = expand("umls:cui")
UMLS_TUI = expand("umls:tui")
UMLS_HAS_STY = expand("umls:hasSTY")
SIFR_MENTION = expand("sifr:mention")

# Mapping predicates (reference: mapping/DefaultOntologyMappingDelegate.java:27-32,81-86)
MAPPING_PREDICATES = [
    expand("skos:exactMatch"),
    expand("skos:closeMatch"),
    expand("skos:relatedMatch"),
    expand("skos:broadMatch"),
    expand("gold:freeTranslation"),
    expand("gold:translation"),
]


def sty_uri(tui: Column) -> Column:
    """TUI → STY URI (F10; reference cuis/CUIOntologyDelegateImpl.java:62-68)."""
    return F.concat(F.lit(STY_BASE), tui, F.lit("/"))


def uri_fragment_code(uri: Column) -> Column:
    """URI fragment before the first ``_`` (F5; reference code/URICodeFinder.java:16-28)."""
    return F.regexp_extract(uri, r"#([^_]+)", 1)
