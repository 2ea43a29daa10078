#!/bin/bash
# Build the reference root-density scheme (unmodified sources) plus the
# golden root runner.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
BUILD="${1:-/tmp/refroot}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$A/crop -I$A/soil -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $A/crop/root.cpp \
    $A/crop/crop.cpp \
    $A/crop/biomass.cpp \
    $A/crop/development.cpp \
    $A/soil/soil.cpp \
    $A/crit3dDate/crit3dDate.cpp \
    $A/crit3dDate/crit3dTime.cpp \
    $A/mathFunctions/basicMath.cpp \
    $A/mathFunctions/statistics.cpp \
    $A/mathFunctions/furtherMathFunctions.cpp \
    $A/mathFunctions/physics.cpp \
    $A/mathFunctions/gammaFunction.cpp; do
  [ -f "$src" ] || continue
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [ -f "$obj" ] || g++ $CXXFLAGS $INC -c "$src" -o "$obj"
done

g++ $CXXFLAGS $INC -c "$HERE/root_runner.cpp" -o "$BUILD/root_runner.o"
g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/root_runner"
echo "built $BUILD/root_runner"
