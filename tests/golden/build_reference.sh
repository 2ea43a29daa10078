#!/bin/bash
# Build the reference soilFluxes3D solver (unmodified sources from
# /root/reference) plus the golden runner. The Qt-only "lineal" dynamic
# loader is shadowed by a stub (never used: useLineal stays false).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/agrolib/soilFluxes3D
MATH=/root/reference/agrolib/mathFunctions
BUILD="${1:-/tmp/refsolver}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -fopenmp -w"
INC="-I$HERE/stub -I$REF -I$REF/lineal -I$MATH"

g++ $CXXFLAGS $INC -c "$REF/soilFluxes3D.cpp" -o "$BUILD/soilFluxes3D.o"
g++ $CXXFLAGS $INC -c "$REF/cpusolver.cpp"    -o "$BUILD/cpusolver.o"
g++ $CXXFLAGS $INC -c "$REF/water.cpp"        -o "$BUILD/water.o"
g++ $CXXFLAGS $INC -c "$REF/heat.cpp"         -o "$BUILD/heat.o"
g++ $CXXFLAGS $INC -c "$REF/soilPhysics.cpp"  -o "$BUILD/soilPhysics.o"
g++ $CXXFLAGS $INC -c "$REF/otherFunctions.cpp" -o "$BUILD/otherFunctions.o"
g++ $CXXFLAGS $INC -c "$HERE/reference_runner.cpp" -o "$BUILD/runner.o"

g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/reference_runner"
echo "built $BUILD/reference_runner"
