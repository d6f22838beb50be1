#!/bin/sh
# Build the native IO runtime -> voxtracer/native/libvoxio.so
set -e
cd "$(dirname "$0")"
mkdir -p ../voxtracer/native
g++ -O2 -shared -fPIC -std=c++17 -o ../voxtracer/native/libvoxio.so voxio.cpp -lz
echo "built voxtracer/native/libvoxio.so"
