#!/bin/bash
# CI gate: the FULL suite must be green before a commit ships
# (round-3 lesson: a known-failing test was committed silently; run
# this -- or `python -m pytest tests/ -q` -- before every milestone
# commit; ~20 min on CPU, the fused suites dominate).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
