#!/bin/bash
# Regenerate the spec/oracle counts in README.md from a real `sbt -batch test`
# log instead of hand-editing (the hand count went stale three rounds in a
# row). Usage:
#   sbt -batch test 2>&1 | tee /tmp/sbt_test.log
#   tools/update_readme_counts.sh /tmp/sbt_test.log
# Oracle count comes from graft.Verify's oracle_sql.json when present
# (pass its path as $2; defaults to /tmp/verify_out/oracle_sql.json).
set -euo pipefail
log="${1:?usage: update_readme_counts.sh <sbt-test-log> [oracle_sql.json]}"
oracle_json="${2:-/tmp/verify_out/oracle_sql.json}"

# `|| true` keeps set -e from killing the assignment on a no-match grep —
# otherwise the friendly guards below can never fire
specs=$(grep -oE 'Total number of tests run: [0-9]+' "$log" | tail -1 | grep -oE '[0-9]+' || true)
[ -n "$specs" ] || { echo "no 'Total number of tests run' in $log" >&2; exit 1; }
fails=$(grep -oE 'Tests: succeeded [0-9]+, failed [0-9]+' "$log" | tail -1 | grep -oE 'failed [0-9]+' | grep -oE '[0-9]+' || true)
[ "$fails" = "0" ] || { echo "refusing to record counts from a FAILING run (failed=${fails:-unknown})" >&2; exit 1; }

sed -i -E "s/\`sbt -batch test\` — [0-9]+ specs:/\`sbt -batch test\` — $specs specs:/" README.md

if [ -f "$oracle_json" ]; then
  oracle=$(python3 -c "import json,sys; print(len(json.load(open(sys.argv[1]))))" "$oracle_json")
  sed -i -E "s/oracle reproduces [0-9]+\/[0-9]+ SQL-expressible/oracle reproduces $oracle\/$oracle SQL-expressible/" README.md
  echo "README.md: $specs specs, $oracle/$oracle oracle queries"
else
  echo "README.md: $specs specs (oracle json not found at $oracle_json — oracle count untouched)"
fi
