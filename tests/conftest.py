from __future__ import annotations

import pytest

from sifr_project_java_ontology_processing_spark.session import get_spark
from sifr_project_java_ontology_processing_spark.sources.synthetic import make_fixture


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sifr-kg-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def kg_fixture():
    return make_fixture(n_pages=120, n_concepts=40, seed=42)


@pytest.fixture(scope="session")
def kg_tables(spark, kg_fixture):
    return kg_fixture.to_spark(spark)
