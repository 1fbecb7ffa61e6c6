#!/usr/bin/env bash
# Thin alias of scripts/compare_output.py for reference-script parity
# (ref: scripts/compare_output.sh — normalized diff of solver outputs:
# iteration counts + residual norms compared, times masked).
exec python "$(dirname "$0")/compare_output.py" "$@"
