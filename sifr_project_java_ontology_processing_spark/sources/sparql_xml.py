"""SPARQL-results-XML → triples (SURVEY.md S7/U4).

The reference SAX-streams NCBO SPARQL XML result files and emits one
TTL line ``<subj> umls:cui "obj"^^xsd:string.`` per ``<result>`` that
carries a ``<uri>`` and a ``<literal>``
(utils/NcboSparqlOutputToTTL.java:62-136).

Here the same event-driven parse runs distributed: whole XML documents
arrive via ``spark.read.text(wholetext=True)`` (one row per file — NCBO
dumps are file-per-query, so per-file parallelism is the natural unit)
and a stdlib-SAX ``mapInPandas`` emits (subj, obj) rows; serialization
back to TTL/N-Triples is the rdf_sink's job.
"""

from __future__ import annotations

import xml.sax
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


class _SparqlResultHandler(xml.sax.ContentHandler):
    """Accumulates (uri, literal) per <result> — same event logic as the
    reference handler (:62-103), minus its global mutable TTL string."""

    def __init__(self) -> None:
        super().__init__()
        self.pairs: list[tuple[str, str]] = []
        self._in_uri = False
        self._in_literal = False
        self._uri: list[str] = []
        self._lit: list[str] = []

    def startElement(self, name, attrs):
        if name == "result":
            self._uri, self._lit = [], []
        elif name == "uri":
            self._in_uri = True
        elif name == "literal":
            self._in_literal = True

    def endElement(self, name):
        if name == "uri":
            self._in_uri = False
        elif name == "literal":
            self._in_literal = False
        elif name == "result":
            uri, lit = "".join(self._uri), "".join(self._lit)
            if uri and lit:
                self.pairs.append((uri, lit))

    def characters(self, content):
        if self._in_uri:
            self._uri.append(content)
        elif self._in_literal:
            self._lit.append(content)


def parse_sparql_results(xml_text: str) -> list[tuple[str, str]]:
    handler = _SparqlResultHandler()
    try:
        xml.sax.parseString(xml_text.encode("utf-8"), handler)
    except xml.sax.SAXException:
        pass  # malformed file → whatever parsed before the error
    return handler.pairs


def sparql_xml_to_triples(
    spark: SparkSession,
    path: str,
    pred: str = "http://bioportal.bioontology.org/ontologies/umls/cui",
) -> DataFrame:
    """XML file(s) → TRIPLES-shaped DataFrame (subj, pred, obj literal)."""
    docs = spark.read.text(path, wholetext=True)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for xml_text in pdf["value"]:
                rows.extend(parse_sparql_results(xml_text or ""))
            yield pd.DataFrame(rows, columns=["subj", "obj"])

    pairs = docs.mapInPandas(_batches, schema="subj string, obj string")
    from pyspark.sql import functions as F

    return pairs.select(
        "subj",
        F.lit(pred).alias("pred"),
        "obj",
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )
