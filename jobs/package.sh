#!/usr/bin/env bash
# Build dist/engine.zip for spark-submit --py-files (BASELINE.json:14).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip indigo_crawler_spark fixtures oracle -x '*__pycache__*'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -3
