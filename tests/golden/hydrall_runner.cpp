// Golden oracle for the HYDRALL photosynthesis kernel.
//
// Compiles the UNMODIFIED reference sources (src/hydrall/hydrall.cpp) and
// calls Crit3DHydrall::photosynthesisKernel (hydrall.cpp:1306-1394)
// directly on inputs from stdin (-fno-access-control pins the private
// weather/environment members the kernel reads).
//
// Input (one case per line, whitespace separated):
//   tAir vpd pressure slopeSatVP psychro co2
//   COMP GAC GHR GSCD J KC KO RD RNI STOMWL VCMAX
// Output per case: ASS GSC TR
#include <cstdio>
#include "hydrall.h"

int main() {
    double tAir, vpd, pres, slope, psy, co2;
    double COMP, GAC, GHR, GSCD, J, KC, KO, RD, RNI, STOMWL, VCMAX;
    while (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                 "%lf %lf %lf",
                 &tAir, &vpd, &pres, &slope, &psy, &co2,
                 &COMP, &GAC, &GHR, &GSCD, &J, &KC, &KO, &RD, &RNI,
                 &STOMWL, &VCMAX) == 17) {
        Crit3DHydrall h;
        h.weatherVariable.myInstantTemp = tAir;
        h.weatherVariable.vaporPressureDeficit = vpd;
        h.weatherVariable.atmosphericPressure = pres;
        h.weatherVariable.derived.slopeSatVapPressureVSTemp = slope;
        h.weatherVariable.derived.psychrometricConstant = psy;
        h.environmentalVariable.CO2 = co2;
        double ASS = 0, GSC = 0, TR = 0;
        h.photosynthesisKernel(COMP, GAC, GHR, GSCD, J, KC, KO, RD, RNI,
                               STOMWL, VCMAX, &ASS, &GSC, &TR);
        printf("%.17g %.17g %.17g\n", ASS, GSC, TR);
    }
    return 0;
}
