#!/bin/bash
# Stream-vs-kernel N/4N probe from a SNAPSHOT of the compiled classes, so
# sbt work can continue while it runs. Usage:
#   tools/streampair.sh [events] [modes...]
# e.g. tools/streampair.sh 8000000 mergel0 stream
set -u
EVENTS="${1:-8000000}"
shift || true
MODES=("${@:-mergel0}")
if [ ${#MODES[@]} -eq 0 ]; then MODES=(mergel0 stream); fi

SNAP=/tmp/graft-snap-probe
rm -rf "$SNAP"
mkdir -p "$SNAP/target/scala-2.13"
cp -r /root/repo/target/scala-2.13/classes "$SNAP/target/scala-2.13/"
cd "$SNAP"

SPARK_JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':' | sed 's/:$//')
CP="$SNAP/target/scala-2.13/classes:$SPARK_JARS"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 GRAFT_BENCH_TMP=/dev/shm
BINLOG=/dev/shm/graft-probe-binlog-$EVENTS

run_child() { # mode executors pin
  local mode=$1 execs=$2 pin=$3
  local cmd=(java $ADD_OPENS -Xmx4g -cp "$CP" graft.ScaleRun \
    "$mode" "$BINLOG" "$EVENTS" 4 "$execs" 4 5120 64)
  if [ -n "$pin" ]; then cmd=(taskset -c "$pin" "${cmd[@]}"); fi
  "${cmd[@]}" 2>/dev/null | grep '"wall"'
}

echo "{\"probe_start_loadavg\":\"$(cut -d' ' -f1-3 /proc/loadavg)\",\"events\":$EVENTS}"
for mode in "${MODES[@]}"; do
  echo "--- mode=$mode N(2x4 pinned 0-7) ---"
  WN=$(run_child "$mode" 2 0-7)
  echo "N: $WN"
  echo "--- mode=$mode 4N(8x4) ---"
  W4=$(run_child "$mode" 8 "")
  echo "4N: $W4"
  python3 - "$WN" "$W4" "$EVENTS" "$mode" <<'EOF'
import json,sys
wn=json.loads(sys.argv[1])["wall"]; w4=json.loads(sys.argv[2])["wall"]; ev=int(sys.argv[3])
print(json.dumps({"mode":sys.argv[4],"t_n":wn,"t_4n":w4,"eps_n":round(ev/wn),"eps_4n":round(ev/w4),"eff":round(wn/(4*w4),3),"loadavg_now":open('/proc/loadavg').read().split()[0]}))
EOF
done
rm -rf /dev/shm/graft-scale-* /dev/shm/graft-spark-local 2>/dev/null
echo "PROBE DONE"
