#!/bin/bash
# Fast pre-commit gate: core unit tests (<2 min target) + bench importability.
# Full suite: python -m pytest tests/ -q     (run before snapshots)
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q -m "not slow" -x ${PYTEST_ARGS}
python -c "import ast; ast.parse(open('bench.py').read()); ast.parse(open('__graft_entry__.py').read())"
echo "check.sh: OK"
