#!/bin/sh
# Build the native data loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC loader.cc \
    -ljpeg -lpng -lpthread -o libsrganfd_loader.so
echo "built $(pwd)/libsrganfd_loader.so"
