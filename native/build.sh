#!/bin/sh
# Build the native host data library (see nm_host.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    nm_host.cpp -o libnm_host.so
echo "built $(pwd)/libnm_host.so"
