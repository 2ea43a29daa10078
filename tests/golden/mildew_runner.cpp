// Golden oracle for the grapevine disease models.
//
// Compiles the UNMODIFIED reference sources (src/grapevine/downyMildew.cpp
// and powderyMildew.cpp) and drives them over input series from stdin.
//
// Downy mode ("DOWNY"):
//   DOWNY nHours
//   then nHours lines: tair rain leafWetness rh firstJanuary(0/1)
//   output per hour: htt currentPmo mmo isInfection oilSpots infectionRate
//                    nActiveCohorts
// Powdery mode ("POWDERY"):
//   POWDERY nDays
//   then nDays lines: tavg rain leafWetness rh isFirst(0/1)
//   output per day: degreeDays aic currentColonies totalSporulating
//                   dayInfection daySporulation infectionRate infectionRisk
//                   aol col
#include <cstdio>
#include <cstring>
#include "downyMildew.h"
#include "powderyMildew.h"
#include "rainfallInterception.h"

int main() {
    char mode[16];
    if (scanf("%15s", mode) != 1) return 2;
    int n;
    if (scanf("%d", &n) != 1) return 2;

    if (!strcmp(mode, "INTERCEPT")) {
        // canopy water balance series (waterManagementCanopy,
        // rainfallInterception.cpp:75-116)
        //   INTERCEPT n; then n lines: stored rain evap lai laiMin extCoef
        //                              leafStorage stemStorage maxStemFlow
        //   output: stored freeRain drainage stemFlow throughfall soilWater
        for (int i = 0; i < n; i++) {
            double st, rain, ev, lai, laiMin, ext, ls, ss, msf;
            if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf", &st, &rain,
                      &ev, &lai, &laiMin, &ext, &ls, &ss, &msf) != 9)
                return 2;
            double freeRain = 0, drain = 0, stem = 0, through = 0, soil = 0;
            canopy::waterManagementCanopy(&st, rain, ev, lai, laiMin, ext,
                                          ls, ss, msf, &freeRain, &drain,
                                          &stem, &through, &soil);
            printf("%.17g %.17g %.17g %.17g %.17g %.17g\n", st, freeRain,
                   drain, stem, through, soil);
        }
        return 0;
    }
    if (!strcmp(mode, "DOWNY")) {
        TdownyMildew dm;
        dm.isGermination = false;
        dm.htt = 0.f;
        dm.currentPmo = 0.f;
        dm.output.mmo = 0.f;
        dm.output.isInfection = false;
        dm.output.oilSpots = 0.f;
        dm.output.infectionRate = 0.f;
        for (int i = 0; i < n; i++) {
            int wet, firstJan;
            if (scanf("%f %f %d %f %d", &dm.input.tair, &dm.input.rain,
                      &wet, &dm.input.relativeHumidity, &firstJan) != 5)
                return 2;
            dm.input.leafWetness = wet;
            downyMildew(&dm, firstJan != 0);
            printf("%.9g %.9g %.9g %d %.9g %.9g %zu\n", dm.htt,
                   dm.currentPmo, dm.output.mmo,
                   dm.output.isInfection ? 1 : 0, dm.output.oilSpots,
                   dm.output.infectionRate, dm.state.size());
        }
    } else {
        Tmildew pm;
        for (int i = 0; i < n; i++) {
            int wet, first;
            if (scanf("%f %f %d %f %d", &pm.input.tavg, &pm.input.rain,
                      &wet, &pm.input.relativeHumidity, &first) != 5)
                return 2;
            pm.input.leafWetness = wet;
            powderyMildew(&pm, first != 0);
            printf("%.9g %.9g %.9g %.9g %d %d %.9g %.9g %.9g %.9g\n",
                   pm.state.degreeDays, pm.state.aic,
                   pm.state.currentColonies, pm.state.totalSporulatingColonies,
                   pm.output.dayInfection ? 1 : 0,
                   pm.output.daySporulation ? 1 : 0,
                   pm.output.infectionRate, pm.output.infectionRisk,
                   pm.output.aol, pm.output.col);
        }
    }
    return 0;
}
