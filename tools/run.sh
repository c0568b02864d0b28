#!/usr/bin/env bash
# Fast runner for graft main classes: java + exported classpath, skipping
# sbt startup. Usage: tools/run.sh <mainClass> [args...]
# Prereq (once, or after build.sbt changes):
#   sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > /tmp/graft_cp.txt
set -euo pipefail
CP_FILE=${GRAFT_CP_FILE:-/tmp/graft_cp.txt}
if [[ ! -s "$CP_FILE" ]]; then
  echo "classpath file $CP_FILE missing; run:" >&2
  echo '  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > /tmp/graft_cp.txt' >&2
  exit 2
fi
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=("--add-opens=java.base/$p=ALL-UNNAMED"); done
exec java "${ARGS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$(cat "$CP_FILE")" "$@"
