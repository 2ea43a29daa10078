#!/bin/bash
# Build the reference HYDRALL model (unmodified sources, Qt-free chain)
# plus the golden hydrall kernel runner (-fno-access-control to pin the
# private weather/environment members).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
S=/root/reference/src
BUILD="${1:-/tmp/refhydrall}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$S/hydrall -I$A/soil -I$A/crop -I$A/gis -I$A/meteo \
     -I$A/crit3dDate -I$A/mathFunctions"

for src in \
    $S/hydrall/hydrall.cpp \
    $A/soil/soil.cpp \
    $A/crop/root.cpp \
    $A/crop/crop.cpp \
    $A/crop/development.cpp \
    $A/crop/biomass.cpp \
    $A/gis/gis.cpp \
    $A/gis/color.cpp \
    $A/meteo/meteo.cpp \
    $A/meteo/meteoPoint.cpp \
    $A/meteo/quality.cpp \
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

g++ $CXXFLAGS -fno-access-control $INC -c "$HERE/hydrall_runner.cpp" \
    -o "$BUILD/hydrall_runner.o"
g++ $CXXFLAGS "$BUILD"/*.o -o "$BUILD/hydrall_runner"
echo "built $BUILD/hydrall_runner"
