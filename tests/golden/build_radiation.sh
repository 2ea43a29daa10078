#!/bin/bash
# Build the reference solarRadiation library (unmodified sources, no Qt in
# the dependency chain) plus the golden radiation runner.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
BUILD="${1:-/tmp/refrad}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w -fopenmp"
INC="-I$A/solarRadiation -I$A/meteo -I$A/gis -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $A/solarRadiation/solarRadiation.cpp \
    $A/solarRadiation/sunPosition.cpp \
    $A/solarRadiation/solPos.cpp \
    $A/solarRadiation/radiationSettings.cpp \
    $A/solarRadiation/transmissivity.cpp \
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
    $HERE/radiation_runner.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    g++ $CXXFLAGS $INC -c "$src" -o "$obj"
  fi
done

g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/radiation_runner"
echo "built $BUILD/radiation_runner"
