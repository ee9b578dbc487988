#!/bin/sh
# Build the native host library for neupan_tpu.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libneupan_host.so neupan_host.cpp
echo "built $(pwd)/libneupan_host.so"
