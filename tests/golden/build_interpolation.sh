#!/bin/bash
# Build the reference interpolation library (unmodified sources, no Qt in
# the whole dependency chain) plus the golden interpolation runner.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
BUILD="${1:-/tmp/refinterp}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$A/interpolation -I$A/meteo -I$A/gis -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $A/interpolation/interpolation.cpp \
    $A/interpolation/interpolationPoint.cpp \
    $A/interpolation/interpolationSettings.cpp \
    $A/interpolation/kriging.cpp \
    $A/interpolation/spatialControl.cpp \
    $A/meteo/meteo.cpp \
    $A/meteo/meteoPoint.cpp \
    $A/meteo/quality.cpp \
    $A/gis/gis.cpp \
    $A/gis/color.cpp \
    $A/crit3dDate/crit3dDate.cpp \
    $A/crit3dDate/crit3dTime.cpp \
    $A/mathFunctions/basicMath.cpp \
    $A/mathFunctions/statistics.cpp \
    $A/mathFunctions/furtherMathFunctions.cpp \
    $A/mathFunctions/physics.cpp \
    $A/mathFunctions/gammaFunction.cpp \
    $HERE/interpolation_runner.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  g++ $CXXFLAGS $INC -c "$src" -o "$obj"
done

g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/interpolation_runner"
echo "built $BUILD/interpolation_runner"
