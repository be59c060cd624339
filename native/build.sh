#!/bin/sh
# Build the native preprocessing library. OpenMP is used if available.
set -e
cd "$(dirname "$0")"
if g++ -O3 -shared -fPIC -fopenmp -o libacfm_preproc.so preproc.cpp 2>/dev/null; then
  echo "built libacfm_preproc.so (openmp)"
else
  g++ -O3 -shared -fPIC -o libacfm_preproc.so preproc.cpp
  echo "built libacfm_preproc.so"
fi
