#!/bin/bash
# Build the native data-loader core.
set -e
cd "$(dirname "$0")/../native"
g++ -O3 -std=c++17 -shared -fPIC -o libmopa_loader.so mopa_loader.cpp
echo "built native/libmopa_loader.so"
