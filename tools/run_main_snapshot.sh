#!/bin/bash
# run_main.sh variant that launches from a CLASS SNAPSHOT directory
# (GRAFT_CLASSES, default /tmp/graft_classes_r15) instead of the live
# sbt output — long background runs must not have sbt rewrite class
# files under their lazily-loading JVM (a changed case-class
# constructor arity mid-run is a NoSuchMethodError hours in).
set -e
CLASSES="${GRAFT_CLASSES:-/tmp/graft_classes_r15}"
if [ ! -d "$CLASSES" ]; then
  echo "run_main_snapshot.sh: $CLASSES not found — cp -a target/scala-2.13/classes <snapshot> first" >&2
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
