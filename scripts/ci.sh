#!/bin/bash
# CI entry point (the Jenkins-scripts analog, SURVEY.md section 4.3):
# build the native IO library, run the unit/golden pytest suite, then the
# shell-level golden suite, then the entry-point dry runs.
set -e
cd "$(dirname "$0")/.."
make -C dsk_tpu/io/native -s
python -m pytest tests/ -x -q
bash scripts/simple_test.sh
python __graft_entry__.py
echo "CI OK"
