#!/bin/bash
# Adopt a bench run into the repo IMMUTABLY (VERDICT r10 #5: adopted
# round numbers must be write-once copies; BENCH_LAST.json is only the
# mutable pointer every later Bench run rewrites).
#
#   tools/adopt_bench.sh /tmp/bench_r11_best.json r11
#
# - copies the run to BENCH_ADOPTED_<tag>.json, REFUSING to overwrite
#   an existing adopted artifact (delete it by hand if you truly mean
#   to re-adopt);
# - refreshes the BENCH_LAST.json pointer;
# - stages both for commit (the commit itself stays a human action).
set -euo pipefail
src=${1:?usage: adopt_bench.sh <run.json> <tag>}
tag=${2:?usage: adopt_bench.sh <run.json> <tag>}
cd "$(dirname "$0")/.."
[ -f "$src" ] || { echo "no such run file: $src" >&2; exit 1; }
python3 -c "import json; json.load(open('$src'))" \
  || { echo "not valid JSON: $src" >&2; exit 1; }
dst="BENCH_ADOPTED_${tag}.json"
if [ -e "$dst" ]; then
  echo "REFUSING to overwrite adopted artifact $dst" >&2
  exit 1
fi
cp "$src" "$dst"
cp "$src" BENCH_LAST.json
git add "$dst" BENCH_LAST.json
echo "adopted $src -> $dst (BENCH_LAST.json pointer refreshed, both staged)"
