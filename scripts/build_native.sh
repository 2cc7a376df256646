#!/usr/bin/env bash
# Build the native host-side components into msa_tpu/native/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p msa_tpu/native
g++ -O2 -shared -fPIC -std=c++17 native/wordpiece.cpp -o msa_tpu/native/_libwordpiece.so
echo "built msa_tpu/native/_libwordpiece.so"
