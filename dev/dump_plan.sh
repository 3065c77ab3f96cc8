#!/bin/bash
# Dump the formatted physical plan of a named query to a file.
# Usage: dev/dump_plan.sh <query> <outfile> [sfDir]
set -euo pipefail
q="$1"; out="$2"; sf="${3:-/root/testdata/sf0.001}"
sbt -batch "Test/runMain graft.ExplainQ $sf $q" 2>/dev/null \
  | sed -n '/== Physical Plan ==/,$p' \
  | sed -e 's/^\[info\] //' -e '/^\[success\]/q' -e '/^\[error\]/d' \
  | grep -v '^\[success\]' > "$out"
echo "$out: $(wc -l < "$out") lines"
