#!/bin/bash
# Run exactly one TPU python job: kills the previously tracked job first.
# Usage: tools/tpurun.sh <script.py> <logfile>
PIDFILE=/tmp/fvsrn_tpu.pid
if [ $# -ne 2 ] || [ ! -f "$1" ]; then
  echo "usage: tools/tpurun.sh <script.py> <logfile>" >&2
  exit 2
fi
case "$2" in
  *.py) echo "refusing to use a .py file as the logfile" >&2; exit 2;;
esac
if [ -f "$PIDFILE" ]; then
  OLD=$(cat $PIDFILE)
  kill -9 $OLD 2>/dev/null
fi
sleep 1
nohup python "$1" > "$2" 2>&1 &
echo $! > $PIDFILE
echo "started $(cat $PIDFILE) -> $2"
