#!/bin/bash
# Back-catalog ~sf1 recertification driver (SURVEY §22 step 4).
#
# Usage: tools/recert_sfbig.sh <sfbig-dir> <query-list-file> <work-dir>
#   <sfbig-dir>        the 10x corpus (e.g. /tmp/sfbig_r12)
#   <query-list-file>  one catalog query name per line (a rotation third:
#                      sort the names of a full Verify dump and slice)
#   <work-dir>         scratch dir; engine dump lands in $work/out,
#                      per-query oracle results append to $work/check.log
#
# Runs the engine dump OUTSIDE sbt (no project lock — the build stays
# usable while this runs), then the DuckDB oracle per query under a
# 900 s timeout for visibility (the monolithic selfcheck batch buffers
# output and hides which query is in flight). Known-infeasible oracles
# at 10x: the recursive-CTE closure family (q66/q70/q141/q143) times
# out in DuckDB — their assignment is verified instead by
#   runMain graft.tools.ClusterCrossCheck <sfbig-dir>
# (byte-identical independent union-find; run it alongside and expect
# "mismatches":0).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SFBIG="$1"; LIST="$2"; WORK="$3"
mkdir -p "$WORK"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$WORK/out"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx28g \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SFBIG" "$WORK/out" $(tr '\n' ' ' < "$LIST") \
  > "$WORK/verify.log" 2>&1
echo "VERIFY_EXIT=$?" >> "$WORK/verify.log"
grep '\[verify\].*failed' "$WORK/verify.log" && echo "ENGINE FAILURES — fix before the oracle pass" >&2

: > "$WORK/check.log"
while read -r q; do
  timeout 900 python3 "$REPO/tools/selfcheck.py" "$SFBIG" "$WORK/out" "$q" \
    >> "$WORK/check.log" 2>&1
  [ $? -eq 124 ] && echo "TIMEOUT $q" >> "$WORK/check.log"
done < "$LIST"
echo "RECERT_DONE" >> "$WORK/check.log"
echo "pass: $(grep -c '^PASS' "$WORK/check.log")  fail/timeout:"
grep -E "^FAIL|^TIMEOUT" "$WORK/check.log" || echo "  none"
