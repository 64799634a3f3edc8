#!/bin/bash
# CI gate: the FULL suite must be green before a commit ships
# (round-3 lesson: a known-failing test was committed silently; run
# this -- or `python -m pytest tests/ -q -n auto` -- before every
# milestone commit).
# Runtime: ~9-10 min with -n 4 (measured round 4: 244 tests, 9m28s);
# a SERIAL run exceeds 50 min -- always use workers.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -n auto "$@"
