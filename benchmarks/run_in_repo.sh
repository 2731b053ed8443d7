#!/bin/sh
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:$PYTHONPATH
exec python "$@"
