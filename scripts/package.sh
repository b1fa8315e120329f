#!/usr/bin/env bash
# Build dist/engine.zip for spark-submit --py-files (BASELINE.json:6).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip codingchallenge_spark -i '*.py'
echo "wrote dist/engine.zip ($(du -h dist/engine.zip | cut -f1))"
