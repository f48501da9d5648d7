#!/bin/sh
# Build the native host-side kernels (edit distance + Smith-Waterman).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libeditdist.so editdist.cpp
echo "built $(pwd)/libeditdist.so"
