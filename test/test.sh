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
