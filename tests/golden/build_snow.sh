#!/bin/bash
# Build the reference Brooks snow model (unmodified sources, Qt-free chain)
# plus the golden snow runner (-fno-access-control to read _evaporation,
# which has no accessor upstream).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
S=/root/reference/src
BUILD="${1:-/tmp/refsnow}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$S/snow -I$A/meteo -I$A/gis -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $S/snow/snow.cpp \
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
    $A/mathFunctions/gammaFunction.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [ -f "$obj" ] || g++ $CXXFLAGS $INC -c "$src" -o "$obj"
done

g++ $CXXFLAGS -fno-access-control $INC -c "$HERE/snow_runner.cpp" \
    -o "$BUILD/snow_runner.o"
g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/snow_runner"
echo "built $BUILD/snow_runner"
