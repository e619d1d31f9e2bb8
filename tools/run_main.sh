#!/bin/bash
# Launch a graft main directly against the compiled classes + Spark jars
# (avoids sbt project-lock contention when tests run concurrently).
# Usage: tools/run_main.sh <MainClass> [args...]
set -e
# derive the repo root from this script's location and fail fast on a
# missing build — a hardcoded path silently ran stale/absent classes
# when invoked from another checkout (round-7 ADVICE item)
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CLASSES="$REPO_ROOT/target/scala-2.13/classes"
if [ ! -d "$CLASSES" ]; then
  echo "run_main.sh: $CLASSES not found — run 'sbt compile' first" >&2
  exit 1
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -XX:-DontCompileHugeMethods \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
