#!/usr/bin/env bash
# Self-produced per-round correctness artifact (VERDICT r15 #1).
#
# The driver's CORRECTNESS_r15.json came back empty ({}) — a driver
# artifact-collection failure that left the round without a hard
# correctness record until the judge re-ran the gate. This script makes
# the repo self-defending: it runs the FULL graft.Verify dump at
# sf0.001 (every declared query -> parquet + oracle_sql.json), then the
# check_oracle DuckDB compare, and writes CORRECTNESS_SELF.json in the
# driver's per-query shape ({"rows_match","schema_match","hash_match",
# "spark_rows","oracle_rows","err"}) at the repo root — commit it each
# round next to BENCH_ADOPTED_r{N}.
#
# Usage: tools/self_correctness.sh [sfDir] [outDir]
#   sfDir  default /root/testdata/sf0.001 (the driver's smoke scale)
#   outDir default /tmp/verify_self (wiped per run)
set -euo pipefail
cd "$(dirname "$0")/.."
sf_dir=${1:-/root/testdata/sf0.001}
out_dir=${2:-/tmp/verify_self}
rm -rf "$out_dir"
sbt -batch "runMain graft.Verify $sf_dir $out_dir"
python3 tools/check_oracle.py "$sf_dir" "$out_dir" --json CORRECTNESS_SELF.json
n=$(python3 -c 'import json; d=json.load(open("CORRECTNESS_SELF.json"));
ok=sum(1 for v in d.values() if v["rows_match"] and v["schema_match"] and v["hash_match"]);
print(f"{ok}/{len(d)}")')
echo "CORRECTNESS_SELF.json: $n queries fully green"
