#!/usr/bin/env bash
# Build the native image loader shared library.
set -e
cd "$(dirname "$0")"
cc -O3 -shared -fPIC -o libd2rimage.so imagedec.c -ljpeg -lpng -lm
echo "built $(pwd)/libd2rimage.so"
