#!/bin/bash
# Build the native audioio shared library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC audioio/audioio.cc -o lib/libaudioio.so
echo "built native/lib/libaudioio.so"
