#!/bin/sh
# Build the native host-side components into libddsp_piano_native.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    voice_allocator.cc \
    -o libddsp_piano_native.so
echo "built $(pwd)/libddsp_piano_native.so"
