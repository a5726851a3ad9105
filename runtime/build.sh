#!/bin/sh
# Build the native runtime library into runtime/build/.
set -e
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -DCMAKE_BUILD_TYPE=Release .. >/dev/null
make -s -j"$(nproc)"
echo "built: $(pwd)/liblidar_runtime.so"
