#!/bin/bash
# Build the reference grapevine library (unmodified sources; the dependency
# chain is Qt-free) plus the golden grapevine runner.  The runner TU alone
# is compiled with -fno-access-control to pin private members the class
# never exposes (see grapevine_runner.cpp).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
A=/root/reference/agrolib
S=/root/reference/src
BUILD="${1:-/tmp/refgrape}"

mkdir -p "$BUILD"
CXXFLAGS="-O2 -std=c++17 -w"
INC="-I$S/grapevine -I$A/soil -I$A/crop -I$A/mathFunctions -I$A/crit3dDate"

for src in \
    $S/grapevine/grapevine.cpp \
    $S/grapevine/downyMildew.cpp \
    $S/grapevine/powderyMildew.cpp \
    $A/crop/rainfallInterception.cpp \
    $A/soil/soil.cpp \
    $A/crop/root.cpp \
    $A/crop/biomass.cpp \
    $A/crit3dDate/crit3dDate.cpp \
    $A/crit3dDate/crit3dTime.cpp \
    $A/mathFunctions/basicMath.cpp \
    $A/mathFunctions/physics.cpp \
    $A/mathFunctions/furtherMathFunctions.cpp \
    $A/mathFunctions/gammaFunction.cpp \
    $A/mathFunctions/statistics.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [ -f "$obj" ] || g++ $CXXFLAGS $INC -c "$src" -o "$obj"
done

g++ $CXXFLAGS -fno-access-control $INC -c "$HERE/grapevine_runner.cpp" \
    -o "$BUILD/grapevine_runner.o"
g++ $CXXFLAGS "$BUILD"/grapevine.o "$BUILD"/soil.o "$BUILD"/root.o \
    "$BUILD"/biomass.o "$BUILD"/crit3dDate.o "$BUILD"/crit3dTime.o \
    "$BUILD"/basicMath.o "$BUILD"/physics.o "$BUILD"/furtherMathFunctions.o \
    "$BUILD"/gammaFunction.o "$BUILD"/statistics.o \
    "$BUILD/grapevine_runner.o" -o "$BUILD/grapevine_runner"
g++ $CXXFLAGS $INC -c "$HERE/mildew_runner.cpp" -o "$BUILD/mildew_runner.o"
g++ $CXXFLAGS "$BUILD"/downyMildew.o "$BUILD"/powderyMildew.o \
    "$BUILD"/rainfallInterception.o \
    "$BUILD"/basicMath.o "$BUILD"/physics.o "$BUILD/mildew_runner.o" -o "$BUILD/mildew_runner"
echo "built $BUILD/grapevine_runner + $BUILD/mildew_runner"
