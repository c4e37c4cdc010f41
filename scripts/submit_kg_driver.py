"""Thin spark-submit application file: the package itself arrives via
``--py-files`` (see scripts/submit_kg.sh); this driver only dispatches
to the packaged CLI, exactly as it would on a YARN/K8s cluster."""

import sys

from sifr_project_java_ontology_processing_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
