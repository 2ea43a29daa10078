#!/bin/sh
# Build the native runtime library (auto-invoked by criteria3d_tpu.native
# on first import when the .so is missing or older than the sources).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -pthread output_writer.cpp -o libc3d_native.so
