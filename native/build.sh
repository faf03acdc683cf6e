#!/usr/bin/env bash
# Build the native shared libraries (image loader + WordPiece tokenizer).
set -e
cd "$(dirname "$0")"
cc -O3 -shared -fPIC -o libd2rimage.so imagedec.c -ljpeg -lpng -lm
cc -O3 -shared -fPIC -o libd2rwordpiece.so wordpiece.c
echo "built $(pwd)/libd2rimage.so and $(pwd)/libd2rwordpiece.so"
