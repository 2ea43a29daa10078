#!/bin/bash
# Build the reference RothC model (unmodified sources, Qt-free chain) plus
# the golden rothC runner.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
S=/root/reference/src
BUILD="${1:-/tmp/refrothc}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$S/rothCplusplus -I$A/gis -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $S/rothCplusplus/rothCplusplus.cpp \
    $A/gis/gis.cpp \
    $A/gis/color.cpp \
    $A/crit3dDate/crit3dDate.cpp \
    $A/crit3dDate/crit3dTime.cpp \
    $A/mathFunctions/basicMath.cpp \
    $A/mathFunctions/statistics.cpp \
    $A/mathFunctions/furtherMathFunctions.cpp \
    $A/mathFunctions/physics.cpp \
    $A/mathFunctions/gammaFunction.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [ -f "$obj" ] || g++ $CXXFLAGS $INC -c "$src" -o "$obj"
done

g++ $CXXFLAGS $INC -c "$HERE/rothc_runner.cpp" -o "$BUILD/rothc_runner.o"
g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/rothc_runner"
echo "built $BUILD/rothc_runner"
