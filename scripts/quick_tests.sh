#!/bin/sh
# Quick test tier: one-to-a-few cheap tests per module, < 2 min on CPU.
# Full suite: python -m pytest tests/ -x -q   (takes tens of minutes)
cd "$(dirname "$0")/.." && exec python -m pytest tests/ -m quick -q "$@"
