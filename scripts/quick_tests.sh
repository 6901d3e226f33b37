#!/bin/sh
# Quick test tier: one-to-a-few cheap tests per module, every module
# covered. ~3 min on this 1-CPU host (the <2 min target assumes a
# multicore runner; xdist measured SLOWER here — 1 core).
# Full suite: python -m pytest tests/ -x -q   (takes tens of minutes)
cd "$(dirname "$0")/.." || exit 1
exec python -m pytest tests/ -m quick -q "$@"
