#!/bin/sh
# Build libparis_io.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -fPIC -shared -pthread \
    -fno-math-errno \
    -Wall -Wextra \
    -o libparis_io.so paris_io.cpp
echo "built $(pwd)/libparis_io.so"
