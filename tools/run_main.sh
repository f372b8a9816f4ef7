#!/bin/sh
# Direct JVM runner for graft mains (avoids sbt lock contention):
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
# Heap via GRAFT_XMX (default 4g; round boxes export 96g); repo root
# derived from this script's own location so any checkout path works.
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="$1"; shift
exec java -Xmx"${GRAFT_XMX:-4g}" \
  -cp "$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*" \
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  "$MAIN" "$@"
