// Golden oracle for the Brooks snowpack model.
//
// Compiles the UNMODIFIED reference sources (src/snow/snow.cpp + its
// Qt-free agrolib deps) and steps Crit3DSnow over an hourly forcing
// sequence read from stdin, printing the full prognostic state each hour.
// Drive order matches criteria3DProject.cpp:1700-1760 (setSnowInputData ->
// computeSnowBrooksModel; computeSnowFall is called inside).
//
// Input:
//   line 1: initSWE initIce initLiquid initIE initSE initSurfT initAge nSteps
//   then nSteps lines: airT prec relHum wind globalRad beamRad transm
//                      clearSkyTransm surfaceWater
// Output per step:
//   swe ice liquid internalEnergy surfaceEnergy surfaceTemp age
//   snowFall snowMelt evaporation sensibleHeat latentHeat
#include <cstdio>
#include "snow.h"

int main() {
    double swe, ice, liq, ie, se, st, age;
    int n;
    if (scanf("%lf %lf %lf %lf %lf %lf %lf %d",
              &swe, &ice, &liq, &ie, &se, &st, &age, &n) != 8) return 2;

    Crit3DSnow snow;
    snow.initializeSnow();
    snow.setSnowWaterEquivalent(swe);
    snow.setIceContent(ice);
    snow.setLiquidWaterContent(liq);
    snow.setInternalEnergy(ie);
    snow.setSurfaceEnergy(se);
    snow.setSnowSurfaceTemp(float(st));
    snow.setAgeOfSnow(float(age));

    for (int i = 0; i < n; i++) {
        double t, p, rh, w, gr, br, tr, cst, wc;
        if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf",
                  &t, &p, &rh, &w, &gr, &br, &tr, &cst, &wc) != 9) return 2;
        snow.setSnowInputData(t, p, rh, w, gr, br, tr, cst, wc);
        snow.computeSnowBrooksModel();
        printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g "
               "%.17g %.17g %.17g %.17g %.17g\n",
               snow.getSnowWaterEquivalent(), snow.getIceContent(),
               snow.getLiquidWaterContent(), snow.getInternalEnergy(),
               snow.getSurfaceEnergy(), snow.getSnowSurfaceTemp(),
               snow.getAgeOfSnow(), snow.getSnowFall(), snow.getSnowMelt(),
               snow._evaporation,   // no accessor upstream; TU is built
                                    // with -fno-access-control
               snow.getSensibleHeat(), snow.getLatentHeat());
    }
    return 0;
}
