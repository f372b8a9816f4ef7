#!/bin/sh
# Direct JVM runner for graft mains (avoids sbt lock contention):
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
MAIN="$1"; shift
exec java -Xmx96g -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
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
