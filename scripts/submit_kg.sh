#!/usr/bin/env bash
# north_rule launch mode: package the engine as a zip and run any CLI
# subcommand via `spark-submit --py-files` (multi-executor ready — the
# master is env-overridable; nothing below is local-mode specific).
#
#   ./scripts/submit_kg.sh kg --pages ... --labels ... --out ...
#   SPARK_MASTER=yarn ./scripts/submit_kg.sh kg ...
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# mktemp -d (not -u): a private dir avoids the predictable-name race on
# shared hosts; the zip is created inside it.
TMPDIR_PKG="$(mktemp -d /tmp/sifr_spark_XXXXXX)"
ZIP="$TMPDIR_PKG/pkg.zip"
trap 'rm -rf "$TMPDIR_PKG"' EXIT
(cd "$REPO" && zip -qr "$ZIP" sifr_project_java_ontology_processing_spark -x '*/__pycache__/*')
# NOT exec: the EXIT trap must fire after spark-submit returns, or the
# temp package dir leaks on every invocation
spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-8}]}" \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_kg_driver.py" "$@"
exit $?
