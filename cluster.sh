#!/usr/bin/env bash
# Start/stop a local Spark standalone cluster (1 master + 1 worker with
# all cores) so the engine can be driven as a REAL multi-executor
# cluster: spark.executor.cores=8 with spark.cores.max=8 vs 32 gives
# N=1 vs 4N=4 executor JVMs — the north rule's two cluster sizes,
# evidenced on one box. Works with the pip-installed pyspark layout
# (no full Spark distribution needed): the worker needs SPARK_HOME
# pointed at the pyspark package dir and SPARK_SCALA_VERSION pinned,
# because the launcher's build-dir probe doesn't understand pip
# layouts.
set -euo pipefail

PYSPARK_DIR="$(python -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')"
BASE="${SPARK_STANDALONE_DIR:-/tmp/spark-standalone}"
MASTER_URL="spark://127.0.0.1:7077"
CORES="${SPARK_WORKER_CORES:-32}"
MEM="${SPARK_WORKER_MEM:-96g}"

start() {
  mkdir -p "$BASE/logs" "$BASE/work"
  if ! pgrep -f "deploy.master.[M]aster" >/dev/null; then
    nohup java -cp "$PYSPARK_DIR/jars/*" -Xmx1g \
      org.apache.spark.deploy.master.Master \
      --host 127.0.0.1 --port 7077 --webui-port 8081 \
      > "$BASE/logs/master.log" 2>&1 &
    sleep 6
  fi
  if ! pgrep -f "deploy.worker.[W]orker" >/dev/null; then
    SPARK_SCALA_VERSION=2.13 SPARK_HOME="$PYSPARK_DIR" \
    SPARK_WORKER_DIR="$BASE/work" PYSPARK_PYTHON="$(which python)" \
    nohup java -cp "$PYSPARK_DIR/jars/*" -Xmx1g \
      org.apache.spark.deploy.worker.Worker \
      --host 127.0.0.1 --cores "$CORES" --memory "$MEM" "$MASTER_URL" \
      > "$BASE/logs/worker.log" 2>&1 &
    sleep 6
  fi
  grep -q "Successfully registered" "$BASE/logs/worker.log" \
    && echo "cluster up: $MASTER_URL (worker: $CORES cores, $MEM)" \
    || { echo "worker failed to register; see $BASE/logs/worker.log"; exit 1; }
}

stop() {
  pgrep -f "deploy.worker.[W]orker" | xargs -r kill || true
  pgrep -f "deploy.master.[M]aster" | xargs -r kill || true
  echo "cluster stopped"
}

case "${1:-start}" in
  start) start ;;
  stop) stop ;;
  *) echo "usage: $0 start|stop"; exit 2 ;;
esac
