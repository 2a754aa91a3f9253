#!/bin/bash
# Round-13 deliverable helper: capture .explain("formatted") per query
# into plans/r13/<query>_<tag>.txt. Usage:
#   dev/capture_plans.sh <before|after> q1 q2 ...
# Runs graft.dev.Explain once for all named queries and splits its output.
set -e
TAG="$1"; shift
OUT=plans/r13
mkdir -p "$OUT"
TMP=$(mktemp)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01} \
  sbt -batch "runMain graft.dev.Explain $*" > "$TMP" 2>/dev/null
python3 - "$TMP" "$OUT" "$TAG" <<'EOF'
import sys, re
tmp, out, tag = sys.argv[1:4]
text = open(tmp).read()
blocks = re.split(r"^========== (\S+) ==========$", text, flags=re.M)
# blocks: [prefix, name1, body1, name2, body2, ...]
for i in range(1, len(blocks) - 1, 2):
    name, body = blocks[i], blocks[i + 1]
    with open(f"{out}/{name}_{tag}.txt", "w") as f:
        f.write(body.strip() + "\n")
    print(f"wrote {out}/{name}_{tag}.txt")
EOF
rm -f "$TMP"
